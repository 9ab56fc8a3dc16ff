"""Checkpoint importers: reference (PyTorch) → emotts (Flax) parameters.

``rank_params_from_torch`` maps a trained reference rank-model state_dict
(rank_model/model.py layout: intensity_extractor.{input_proj, fft_block.
layers.N.{self_attn, conv1, conv2, norm1, norm2}, emotion_embedding,
classifier} + projector) onto this framework's RankModel params, so a user
can reuse a best_model.pth trained with the reference.  Covers the
cross-stage artifact handoff (the frozen extractor consumed by FS2 training
and the bucketizer).

Layout conventions handled:
* torch Linear weight (out, in) → flax Dense kernel (in, out);
* torch MultiheadAttention packed in_proj (3H, H) → per-head q/k/v
  DenseGeneral kernels (H, heads, head_dim) and out_proj → (heads,
  head_dim, H);
* torch Conv1d weight (out, in, k) → flax Conv kernel (k, in, out);
* LayerNorm weight/bias → scale/bias.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _dense(sd, prefix):
    return {
        "kernel": np.asarray(sd[f"{prefix}.weight"]).T,
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _conv(sd, prefix):
    return {
        "kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 1, 0)),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _layernorm(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _attention(sd, prefix, n_heads: int) -> Dict:
    w_in = np.asarray(sd[f"{prefix}.in_proj_weight"])  # (3H, H)
    b_in = np.asarray(sd[f"{prefix}.in_proj_bias"])  # (3H,)
    h3, hidden = w_in.shape
    assert h3 == 3 * hidden
    d = hidden // n_heads

    def split(mat, vec, i):
        w = mat[i * hidden : (i + 1) * hidden]  # (H, H): out × in
        b = vec[i * hidden : (i + 1) * hidden]
        return {
            "kernel": w.T.reshape(hidden, n_heads, d),
            "bias": b.reshape(n_heads, d),
        }

    w_out = np.asarray(sd[f"{prefix}.out_proj.weight"])  # (H, H)
    b_out = np.asarray(sd[f"{prefix}.out_proj.bias"])
    return {
        "query": split(w_in, b_in, 0),
        "key": split(w_in, b_in, 1),
        "value": split(w_in, b_in, 2),
        "out": {"kernel": w_out.T.reshape(n_heads, d, hidden), "bias": b_out},
    }


def rank_params_from_torch(sd: Dict, n_layers: int, n_heads: int) -> Dict:
    """Reference rank-model state_dict → RankModel flax variables."""
    ext = "intensity_extractor"
    fft = {}
    for i in range(n_layers):
        layer = f"{ext}.fft_block.layers.{i}"
        fft[f"layer_{i}"] = {
            "attn": _attention(sd, f"{layer}.self_attn", n_heads),
            "ffn": {
                "conv1": _conv(sd, f"{layer}.conv1"),
                "conv2": _conv(sd, f"{layer}.conv2"),
            },
            "norm1": _layernorm(sd, f"{layer}.norm1"),
            "norm2": _layernorm(sd, f"{layer}.norm2"),
        }
    params = {
        "intensity_extractor": {
            "input_proj": _dense(sd, f"{ext}.input_proj"),
            "fft": fft,
            "emotion_embedding": {
                "embedding": np.asarray(sd[f"{ext}.emotion_embedding.weight"])
            },
            "classifier": _dense(sd, f"{ext}.classifier"),
        },
        "projector": {"kernel": np.asarray(sd["projector.weight"]).T},
    }
    return {"params": params}
