"""Fused Pallas ResBlock kernel vs the pure-JAX reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotts.ops.resblock import block_halo, fused_resblock1, resblock1_reference


def _setup(b=2, t=300, ch=32, k=3, n_d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, t, ch)).astype(np.float32)
    w1 = (rng.standard_normal((n_d, k, ch, ch)) * 0.1).astype(np.float32)
    b1 = (rng.standard_normal((n_d, ch)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((n_d, k, ch, ch)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((n_d, ch)) * 0.1).astype(np.float32)
    return map(jnp.asarray, (x, w1, b1, w2, b2))


def test_block_halo():
    # receptive field rounded up to the 8-sublane tiling
    assert block_halo(3, (1, 3, 5)) == 16  # 12 → 16
    assert block_halo(11, (1, 3, 5)) == 64  # 60 → 64
    assert block_halo(3, (1,)) == 8  # 2 → 8


@pytest.mark.parametrize("k,dilations", [(3, (1, 3, 5)), (7, (1, 3, 5)), (3, (1, 3))])
def test_fused_matches_reference(k, dilations):
    x, w1, b1, w2, b2 = _setup(k=k, n_d=len(dilations))
    ref = resblock1_reference(x, w1, b1, w2, b2, dilations)
    got = fused_resblock1(x, w1, b1, w2, b2, dilations, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fused_multi_tile_boundaries():
    """Tile boundaries must be exact (halo covers the receptive field)."""
    x, w1, b1, w2, b2 = _setup(b=1, t=700, ch=16, k=3, seed=1)
    ref = resblock1_reference(x, w1, b1, w2, b2, (1, 3, 5))
    got = fused_resblock1(x, w1, b1, w2, b2, (1, 3, 5), tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_reference_matches_hifigan_module():
    """resblock1_reference implements exactly nn.hifigan.ResBlock1."""
    from emotts.nn.hifigan import ResBlock1

    x, w1, b1, w2, b2 = _setup(b=1, t=64, ch=8, k=3)
    block = ResBlock1(channels=8, kernel_size=3, dilations=(1, 3, 5))
    params = {
        "params": {
            **{f"convs1_{i}_kernel": w1[i] for i in range(3)},
            **{f"convs1_{i}_bias": b1[i] for i in range(3)},
            **{f"convs2_{i}_kernel": w2[i] for i in range(3)},
            **{f"convs2_{i}_bias": b2[i] for i in range(3)},
        }
    }
    out_module = block.apply(params, x)
    out_ref = resblock1_reference(x, w1, b1, w2, b2, (1, 3, 5))
    np.testing.assert_allclose(
        np.asarray(out_module), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )
