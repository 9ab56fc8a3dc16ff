"""Tensor-parallel sharding tests: TP-sharded forward/grads must equal the
replicated computation (XLA inserts the collectives; math is identical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotts.nn import FFTStack
from emotts.parallel.mesh import make_mesh, replicate, shard_batch
from emotts.parallel.tp import shard_params_tp, tp_param_shardings
from emotts.utils.config import MeshConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _stack_setup():
    stack = FFTStack(num_layers=2, d_model=32, n_heads=2, ffn_dim=64,
                     kernel_sizes=(9, 1), final_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 12, 32))
    params = stack.init(jax.random.PRNGKey(1), x)
    return stack, params, x


def test_tp_sharding_rules_hit_heavy_weights():
    stack, params, _ = _stack_setup()
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    shardings = tp_param_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded_paths = [
        "/".join(getattr(p, "key", str(p)) for p in path)
        for path, s in flat
        if s.spec != jax.sharding.PartitionSpec()
    ]
    # conv-FFN and attention projections must be sharded
    assert any("ffn/conv1/kernel" in p for p in sharded_paths)
    assert any("ffn/conv2/kernel" in p for p in sharded_paths)
    assert any("attn/query/kernel" in p for p in sharded_paths)
    assert any("attn/out/kernel" in p for p in sharded_paths)
    # norms replicate
    assert not any("norm" in p for p in sharded_paths)


def test_tp_forward_matches_replicated():
    stack, params, x = _stack_setup()
    ref = np.asarray(stack.apply(params, x))

    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    params_tp = shard_params_tp(params, mesh)
    x_sh = shard_batch(mesh, {"x": np.asarray(x)})["x"]
    out = np.asarray(jax.jit(stack.apply)(params_tp, x_sh))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_tp_grads_match_replicated():
    stack, params, x = _stack_setup()

    def loss(p, x):
        return (stack.apply(p, x) ** 2).mean()

    g_ref = jax.device_get(jax.jit(jax.grad(loss))(params, x))

    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    params_tp = shard_params_tp(params, mesh)
    x_sh = shard_batch(mesh, {"x": np.asarray(x)})["x"]
    g_tp = jax.device_get(jax.jit(jax.grad(loss))(params_tp, x_sh))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-6)
