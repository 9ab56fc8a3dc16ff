"""Device-mesh and sharding utilities.

The reference is strictly single-device (SURVEY.md §2.3: no distributed
support anywhere).  Here every train step is pjit-compiled over an explicit
``jax.sharding.Mesh`` with a data axis (batch-sharded inputs, replicated
params, XLA-inserted gradient all-reduce over ICI) and a model axis reserved
for future tensor sharding.  All cross-chip traffic flows through the
shardings declared here so DP composes cleanly with anything added later.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emotts.utils.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    cfg = cfg or MeshConfig()
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model_parallel)
    data = cfg.data_parallel if cfg.data_parallel > 0 else n // model
    if data * model > n:
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {n}; "
            "set mesh.data_parallel/model_parallel to match"
        )
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with the batch dim sharded over `data`.

    Single-process: a straight ``device_put``.  Multi-process SPMD: every
    process passes only its LOCAL rows of the (identically planned) global
    batch — 1/process_count of the batch dim — and the global array is
    assembled with ``make_array_from_process_local_data`` so all hosts trace
    the same global shapes (see BucketLoader's row sharding).

    Non-array entries (strings/lists) pass through untouched."""
    sharding = batch_sharding(mesh)
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if multiprocess:
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            else:
                out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    return jax.device_put(tree, replicated(mesh))


def round_up_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (shard-alignment arithmetic —
    the one implementation shared by the loader, bucketizer, and
    synthesizer padding paths)."""
    m = max(1, m)
    return -(-n // m) * m


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape[mesh.axis_names[0]]
