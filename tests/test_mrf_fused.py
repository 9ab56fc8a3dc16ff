"""Fused MRF-stage Pallas kernel vs pure-JAX reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from emotts.ops.mrf import _StagePlan, fused_mrf_stage, mrf_reference


def _params(rng, channels, kernel_sizes=(3, 7, 11), n_d=3, scale=0.3):
    out = []
    for k in kernel_sizes:
        w1 = rng.standard_normal((n_d, k, channels, channels)).astype(np.float32) * scale
        b1 = rng.standard_normal((n_d, channels)).astype(np.float32) * 0.1
        w2 = rng.standard_normal((n_d, k, channels, channels)).astype(np.float32) * scale
        b2 = rng.standard_normal((n_d, channels)).astype(np.float32) * 0.1
        out.append(tuple(jnp.asarray(a) for a in (w1, b1, w2, b2)))
    return out


@pytest.mark.parametrize("channels,t", [(128, 256), (64, 256), (32, 512)])
def test_fused_mrf_matches_reference(rng, channels, t):
    params = _params(rng, channels, scale=1.0 / channels)
    x = jnp.asarray(rng.standard_normal((2, t, channels)).astype(np.float32))
    ref = mrf_reference(x, params)
    got = fused_mrf_stage(x, params, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_mrf_tail_padding(rng):
    """T not a multiple of factor*tile exercises the tail-tile masking."""
    channels = 64
    params = _params(rng, channels, scale=1.0 / channels)
    x = jnp.asarray(rng.standard_normal((1, 360, channels)).astype(np.float32))
    ref = mrf_reference(x, params)
    got = fused_mrf_stage(x, params, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_mrf_single_resblock(rng):
    """Degenerate MRF of one resblock equals that resblock."""
    channels = 32
    params = _params(rng, channels, kernel_sizes=(7,), scale=1.0 / channels)
    x = jnp.asarray(rng.standard_normal((2, 256, channels)).astype(np.float32))
    ref = mrf_reference(x, params, kernel_sizes=(7,))
    got = fused_mrf_stage(x, params, kernel_sizes=(7,), tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_stage_plan_halo_covers_receptive_field():
    plan = _StagePlan((3, 7, 11), (1, 3, 5), 32, 4)
    # deepest chain: k=11 → creep = 10+20+30 = 60 samples = 15 packed rows → 16
    assert plan.halo == 16
    assert plan.n_convs == 18
    plan1 = _StagePlan((3, 7, 11), (1, 3, 5), 128, 1)
    assert plan1.halo == 64  # 60 rounded up to sublane tiling
    # F=1 packed taps are exactly the original taps
    assert plan1.total_taps == sum(2 * 3 * k for k in (3, 7, 11))


def test_generator_fused_mrf_flag(rng):
    """fused_mrf=True: identical params tree and near-identical output."""
    import jax
    import jax.numpy as jnp

    from emotts.nn.hifigan import HiFiGANGenerator

    kw = dict(
        in_channels=8, upsample_initial_channel=64,
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
    )
    gen = HiFiGANGenerator(**kw)
    gen_fused = HiFiGANGenerator(fused_mrf=True, **kw)
    mel = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
    v = gen.init(jax.random.PRNGKey(0), mel)
    v2 = gen_fused.init(jax.random.PRNGKey(0), mel)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    out = gen.apply(v, mel)
    out_fused = gen_fused.apply(v, mel)  # same params, fused path
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out), rtol=2e-5, atol=2e-5
    )
