"""Mesh / data-parallel tests on the 8-virtual-device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotts.losses import rank_loss
from emotts.nn import RankModel
from emotts.parallel.mesh import make_mesh, replicate, shard_batch
from emotts.utils.config import MeshConfig

N_DEV = len(jax.devices())


def test_virtual_devices_present():
    assert N_DEV == 8, "conftest must provide 8 virtual CPU devices"


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (N_DEV, 1)
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh2.devices.shape == (4, 2)
    # explicit sizes smaller than the device count use a prefix of devices
    mesh3 = make_mesh(MeshConfig(data_parallel=3, model_parallel=2))
    assert mesh3.devices.shape == (3, 2)
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data_parallel=5, model_parallel=2))


def _tiny_setup(batch):
    model = RankModel(
        n_mels=8, n_heads=2, n_emotions=3, n_layers=1,
        hidden_dim=16, kernel_size=3, ffn_mult=2, dropout=0.0,
    )
    rng = np.random.default_rng(0)
    t = 12
    data = {
        "emo_x": rng.standard_normal((batch, t, 10)).astype(np.float32),
        "neu_x": rng.standard_normal((batch, t, 10)).astype(np.float32),
        "emotions": rng.integers(0, 3, batch).astype(np.int32),
        "lengths": np.full((batch,), t, np.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mixup": jax.random.PRNGKey(1)},
        jnp.asarray(data["emo_x"]), jnp.asarray(data["neu_x"]),
        jnp.asarray(data["emotions"]), jnp.asarray(data["lengths"]),
    )
    lambdas = jnp.tile(jnp.linspace(0.1, 0.9, batch)[None, :], (2, 1))

    def loss_fn(params, batch):
        preds = model.apply(
            params, batch["emo_x"], batch["neu_x"], batch["emotions"],
            batch["lengths"], lambdas,
        )
        total, _ = rank_loss(preds, batch["emotions"])
        return total

    return params, data, loss_fn


def test_dp_grads_match_single_device():
    """Gradients with batch sharded over 8 devices == single-device gradients
    (XLA inserts the cross-device reduction; math must be identical)."""
    params, data, loss_fn = _tiny_setup(batch=16)
    grad_fn = jax.jit(jax.grad(loss_fn))

    # single device
    g1 = jax.device_get(grad_fn(params, {k: jnp.asarray(v) for k, v in data.items()}))

    # 8-way data parallel
    mesh = make_mesh()
    params_r = replicate(mesh, params)
    batch_s = shard_batch(mesh, data)
    g8 = jax.device_get(grad_fn(params_r, batch_s))

    flat1 = jax.tree_util.tree_leaves(g1)
    flat8 = jax.tree_util.tree_leaves(g8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = {"x": np.zeros((16, 4), np.float32), "texts": ["a", "b"]}
    out = shard_batch(mesh, batch)
    assert out["texts"] == ["a", "b"]
    shard_shapes = {s.data.shape for s in out["x"].addressable_shards}
    assert shard_shapes == {(2, 4)}  # 16 / 8 devices
