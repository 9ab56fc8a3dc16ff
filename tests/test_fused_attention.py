"""Fused Pallas attention (emotts/ops/attention.py) vs the reference path.

CPU runs use pallas interpret mode and cover the deterministic math
(forward and custom-vjp backward, padding masks, model integration).  The
dropout path needs the TPU hardware PRNG — exercised under
EMOTTS_TEST_DEVICE=1 with a statistical check.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import emotts.ops.attention as fa
from emotts.nn.blocks import MultiHeadSelfAttention

ON_DEVICE = os.environ.get("EMOTTS_TEST_DEVICE") == "1"


@pytest.fixture(autouse=True)
def _interpret():
    if not ON_DEVICE:
        fa._INTERPRET = True
    yield
    fa._INTERPRET = False


def _ref_attention(q, k, v, bias, dh):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(dh)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _inputs(b=2, t=64, h=2, d=48, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), dtype)
    valid = np.ones((b, t), np.float32)
    valid[0, t // 2:] = 0.0
    bias = jnp.asarray((1.0 - valid) * -1e9, jnp.float32)
    return q, k, v, bias


def test_forward_matches_reference():
    q, k, v, bias = _inputs()
    seed = jnp.zeros((q.shape[0],), jnp.int32)
    out = fa.fused_attention(q, k, v, bias, seed, 0.0)
    want = _ref_attention(q, k, v, bias, q.shape[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-6)


def test_backward_matches_reference():
    q, k, v, bias = _inputs()
    seed = jnp.zeros((q.shape[0],), jnp.int32)

    def loss_f(q, k, v):
        return jnp.sum(jnp.sin(fa.fused_attention(q, k, v, bias, seed, 0.0)))

    def loss_r(q, k, v):
        return jnp.sum(jnp.sin(_ref_attention(q, k, v, bias, q.shape[-1])))

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_padded_keys_get_zero_weight():
    """Outputs for valid queries must ignore padded keys entirely."""
    q, k, v, bias = _inputs(t=32)
    seed = jnp.zeros((q.shape[0],), jnp.int32)
    out1 = fa.fused_attention(q, k, v, bias, seed, 0.0)
    # garbage in the padded key/value rows must not change valid outputs
    k2 = k.at[0, 16:].set(1e3)
    v2 = v.at[0, 16:].set(-1e3)
    out2 = fa.fused_attention(q, k2, v2, bias, seed, 0.0)
    np.testing.assert_allclose(
        np.asarray(out1[0, :16]), np.asarray(out2[0, :16]), atol=2e-6
    )


def test_module_fused_matches_unfused_deterministic():
    """MultiHeadSelfAttention(fused=True) == the einsum path at eval time,
    identical param tree."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 40, 64)), jnp.float32)
    lengths = jnp.asarray([40, 25], jnp.int32)
    valid = jnp.arange(40)[None, :] < lengths[:, None]
    kw = dict(d_model=64, n_heads=2, dropout=0.1)
    m_ref = MultiHeadSelfAttention(**kw, fused=False)
    m_fused = MultiHeadSelfAttention(**kw, fused=True)
    params = m_ref.init(jax.random.PRNGKey(0), x, valid, True)
    assert jax.tree.structure(params) == jax.tree.structure(
        m_fused.init(jax.random.PRNGKey(0), x, valid, True)
    )
    y_ref = m_ref.apply(params, x, valid, True)
    y_fused = m_fused.apply(params, x, valid, True)
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_fused), atol=3e-6
    )


def test_fs2_forward_with_fused_attention():
    """FastSpeech2 runs end-to-end with fastspeech2.fused_attention=True and
    matches the unfused forward at eval time (same params)."""
    from emotts.train.fs2_trainer import build_fastspeech2, init_fs2_variables
    from emotts.utils.config import Config

    cfg = Config()
    fs = cfg.fastspeech2
    fs.enc_num_layers = fs.dec_num_layers = 1
    fs.enc_d_model = fs.dec_d_model = 32
    fs.enc_ffn_dim = fs.dec_ffn_dim = 64
    fs.postnet_embedding_dim = 32
    cfg.train_fs2.compute_dtype = "float32"

    def run(fused):
        fs.fused_attention = fused
        model = build_fastspeech2(cfg)
        variables = init_fs2_variables(cfg, model, seed=0)
        p, t = 8, 16
        preds = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.ones((2, p), jnp.int32),
            jnp.zeros((2,), jnp.int32),
            jnp.full((2, p), 2, jnp.int32),
            jnp.zeros((2, t), jnp.float32),
            jnp.zeros((2, t), jnp.float32),
            jnp.zeros((2, p, cfg.fastspeech2.intensity_dim), jnp.float32),
            max_mel_len=t,
        )
        return preds[0]

    np.testing.assert_allclose(
        np.asarray(run(False)), np.asarray(run(True)), atol=1e-5
    )


def test_sharded_mesh_correctness():
    """Under a data-sharded pjit mesh the custom_partitioning batch rule
    splits the kernel per shard — output stays data-sharded (no gather) and
    forward/backward numerics are exact."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs the 4+-device virtual CPU mesh")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    q, k, v, bias = _inputs(b=8, t=32)
    seed = jnp.zeros((q.shape[0],), jnp.int32)
    sh = NamedSharding(mesh, P("data"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    bs = jax.device_put(bias, sh)
    ss = jax.device_put(seed, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda *a: fa.fused_attention(*a, 0.0))(qs, ks, vs, bs, ss)
    want = _ref_attention(q, k, v, bias, q.shape[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-6)
    # the custom_partitioning batch rule must keep the output SHARDED on
    # data (no gather around the kernel)
    assert out.sharding.spec and out.sharding.spec[0] == "data", out.sharding
    # grads flow through the partitioned backward too
    g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        jnp.sin(fa.fused_attention(q, k, v, bs, ss, 0.0).astype(jnp.float32))
    ), argnums=(0, 1, 2)))(qs, ks, vs)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        jnp.sin(_ref_attention(q, k, v, bias, q.shape[-1]).astype(jnp.float32))
    ), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-6)


@pytest.mark.skipif(not ON_DEVICE, reason="dropout path needs the TPU PRNG")
def test_dropout_statistics_on_device():
    q, k, v, bias = _inputs(b=4, t=128)
    rate = 0.5
    seed = jnp.full((q.shape[0],), 7, jnp.int32)
    out = fa.fused_attention(q, k, v, bias, seed, rate)
    out2 = fa.fused_attention(q, k, v, bias, seed, rate)
    # same seed → deterministic
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = fa.fused_attention(q, k, v, bias, jnp.full((q.shape[0],), 8, jnp.int32), rate)
    assert not np.allclose(np.asarray(out), np.asarray(out3))
    # unbiased in expectation: mean over many seeds ≈ deterministic output
    outs = [
        np.asarray(
            fa.fused_attention(q, k, v, bias, jnp.full((q.shape[0],), s * 101, jnp.int32), rate)
        )
        for s in range(40)
    ]
    det = np.asarray(fa.fused_attention(q, k, v, bias, seed, 0.0))
    err = np.abs(np.mean(outs, axis=0) - det).mean() / (np.abs(det).mean() + 1e-9)
    assert err < 0.15, err
