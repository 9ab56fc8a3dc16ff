"""Polyphase time-packing: exactness vs the reference resblock."""

import jax.numpy as jnp
import numpy as np
import pytest

from emotts.ops.polyphase import (
    pack_conv_weights,
    pack_time,
    packed_conv,
    packed_resblock1,
    unpack_time,
)
from emotts.ops.resblock import resblock1_reference


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    assert jnp.allclose(unpack_time(pack_time(x, 4), 4), x)
    # layout: x'[m, p*C+c] == x[F*m+p, c]
    xp = pack_time(x, 4)
    np.testing.assert_array_equal(np.asarray(xp[0, 1, 8:16]), np.asarray(x[0, 5]))


@pytest.mark.parametrize("k,d,f", [(3, 1, 4), (3, 5, 4), (7, 3, 2), (11, 5, 4)])
def test_packed_conv_matches_plain(k, d, f):
    from jax import lax

    rng = np.random.default_rng(1)
    b, t, c = 2, 32, 8
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w = rng.standard_normal((k, c, c)).astype(np.float32) * 0.2

    pad = (k - 1) // 2 * d
    ref = lax.conv_general_dilated(
        x, jnp.asarray(w), (1,), [(pad, pad)], rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )

    wp, lo, hi = pack_conv_weights(w, d, f)
    got = unpack_time(packed_conv(pack_time(x, f), wp, lo, hi), f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("factor", [2, 4])
def test_packed_resblock_matches_reference(factor):
    rng = np.random.default_rng(2)
    b, t, c, k, nd = 2, 64, 8, 3, 3
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((nd, k, c, c)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((nd, k, c, c)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((nd, c)).astype(np.float32) * 0.1)

    ref = resblock1_reference(x, w1, b1, w2, b2, (1, 3, 5))
    got = packed_resblock1(x, w1, b1, w2, b2, (1, 3, 5), factor)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cin,cout,k,s", [(16, 8, 16, 8), (8, 4, 4, 2), (12, 6, 16, 8)])
def test_subpixel_conv_transpose_matches_dilated(cin, cout, k, s):
    from emotts.nn.hifigan import _conv_transpose1d
    from emotts.ops.polyphase import subpixel_conv_transpose

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 10, cin)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.2)
    ref = _conv_transpose1d(x, kernel, s)
    got = subpixel_conv_transpose(x, kernel, s)
    assert got.shape == ref.shape == (2, 10 * s, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
