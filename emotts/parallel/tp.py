"""Tensor-parallel sharding rules over the (data, model) mesh.

The models here are small enough that pure DP is optimal (SURVEY.md §2.3),
but the framework supports sharding the heavy weights over the model axis so
larger configurations scale without code changes: XLA partitions the
matmuls/convs and inserts the all-gathers/reduce-scatters over ICI.

Rules (Megatron-style column→row pairing, applied by parameter path):
* FFT conv-FFN: conv1 kernel (k, d, ffn) shards its output features
  (column-parallel); conv2 kernel (k, ffn, d) shards its input features
  (row-parallel) — the pair needs one reduce per block.
* Attention: q/k/v DenseGeneral kernels (d, heads, head_dim) shard the heads
  axis; the out projection (heads, head_dim, d) shards its heads input.
* Everything else (norms, embeddings, small heads) replicates.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emotts.parallel.mesh import MODEL_AXIS


def _spec_for(path: tuple, value) -> P:
    keys = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(keys)
    ndim = getattr(value, "ndim", 0)
    if "ffn/conv1" in joined and keys[-1] == "kernel" and ndim == 3:
        return P(None, None, MODEL_AXIS)  # (k, d, ffn): column-parallel
    if "ffn/conv1" in joined and keys[-1] == "bias" and ndim == 1:
        return P(MODEL_AXIS)
    if "ffn/conv2" in joined and keys[-1] == "kernel" and ndim == 3:
        return P(None, MODEL_AXIS, None)  # (k, ffn, d): row-parallel
    if keys[-1] == "kernel" and ndim == 3 and any(
        f"attn/{n}" in joined for n in ("query", "key", "value")
    ):
        return P(None, MODEL_AXIS, None)  # (d, heads, head_dim): shard heads
    if keys[-1] == "bias" and ndim == 2 and any(
        f"attn/{n}" in joined for n in ("query", "key", "value")
    ):
        return P(MODEL_AXIS, None)
    if "attn/out" in joined and keys[-1] == "kernel" and ndim == 3:
        return P(MODEL_AXIS, None, None)  # (heads, head_dim, d): row-parallel
    return P()  # replicated


def tp_param_shardings(params: Any, mesh: Mesh):
    """Pytree of NamedShardings implementing the TP rules above."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, _spec_for(path, v)), params
    )


def shard_params_tp(params: Any, mesh: Mesh):
    """device_put params with the TP layout (no-op layout when model=1)."""
    return jax.device_put(params, tp_param_shardings(params, mesh))


def state_shardings(state: Any, mesh: Mesh):
    """NamedSharding tree for a whole TrainState: TP rules for params AND the
    optimizer moments (their paths embed the param paths, so the same rules
    match), replicated for everything else.

    Used both to place the initial state and as the train step's
    ``out_shardings``.  Pinning outputs matters: when the ``model`` axis has
    size 1 (every single-chip or pure-DP run), XLA canonicalizes
    ``PartitionSpec('model', …)`` outputs to ``PartitionSpec()`` — the next
    call then sees a different input signature and silently RECOMPILES the
    whole step (a multi-minute stall on remote-compile platforms).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, _spec_for(path, v)), state
    )
