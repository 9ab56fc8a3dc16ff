"""FFT block / mask / positional-encoding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotts.nn import (
    FFTBlock,
    FFTStack,
    sequence_mask,
    sinusoidal_positional_encoding,
)


def test_sequence_mask():
    m = sequence_mask(jnp.array([1, 3]), 4)
    np.testing.assert_array_equal(
        np.asarray(m), [[True, False, False, False], [True, True, True, False]]
    )


def test_positional_encoding_values():
    pe = sinusoidal_positional_encoding(16, 8)
    assert pe.shape == (1, 16, 8)
    np.testing.assert_allclose(pe[0, 0], np.array([0, 1, 0, 1, 0, 1, 0, 1]), atol=1e-6)
    # pe[t, 0] == sin(t)
    np.testing.assert_allclose(pe[0, 2, 0], np.sin(2.0), rtol=1e-5)
    np.testing.assert_allclose(pe[0, 3, 1], np.cos(3.0), rtol=1e-5)


@pytest.fixture
def block_params():
    block = FFTBlock(d_model=32, n_heads=2, ffn_dim=64, kernel_sizes=(9, 1))
    x = jnp.zeros((2, 12, 32))
    params = block.init(jax.random.PRNGKey(0), x)
    return block, params


def test_fft_block_shapes(block_params):
    block, params = block_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 32))
    y = block.apply(params, x)
    assert y.shape == (2, 12, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_fft_block_pad_invariance(block_params):
    """Valid-region outputs must not depend on how much zero padding follows."""
    block, params = block_params
    rng = jax.random.PRNGKey(2)
    data = jax.random.normal(rng, (2, 8, 32))
    lengths = jnp.array([8, 8])

    x_short = jnp.pad(data, ((0, 0), (0, 4), (0, 0)))  # T=12
    x_long = jnp.pad(data, ((0, 0), (0, 10), (0, 0)))  # T=18

    y_short = block.apply(params, x_short, sequence_mask(lengths, 12))
    y_long = block.apply(params, x_long, sequence_mask(lengths, 18))
    np.testing.assert_allclose(
        np.asarray(y_short[:, :8]), np.asarray(y_long[:, :8]), rtol=2e-5, atol=2e-5
    )


def test_fft_block_garbage_pad_invariance(block_params):
    """Changing the *content* of padded frames must not affect frames that are
    more than one conv receptive field away from the boundary (attention is
    masked; the conv FFN sees pad content only within its kernel radius, same
    as the reference's zero-padded convs)."""
    block, params = block_params
    rng = jax.random.PRNGKey(3)
    data = jax.random.normal(rng, (1, 16, 32))
    lengths = jnp.array([10])
    mask = sequence_mask(lengths, 16)

    x_zero = data.at[:, 10:].set(0.0)
    x_junk = data.at[:, 10:].set(99.0)
    y_zero = block.apply(params, x_zero, mask)
    y_junk = block.apply(params, x_junk, mask)
    # receptive field of the two convs (k=9,1) is 4+0 frames on each side
    np.testing.assert_allclose(
        np.asarray(y_zero[:, :6]), np.asarray(y_junk[:, :6]), rtol=2e-5, atol=2e-5
    )


def test_fft_stack_final_norm():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 16))
    stack = FFTStack(num_layers=2, d_model=16, n_heads=2, ffn_dim=32, final_norm=True)
    params = stack.init(jax.random.PRNGKey(0), x)
    y = stack.apply(params, x)
    # per-position LayerNorm at the top: mean ~ 0, std ~ 1 over features
    np.testing.assert_allclose(np.asarray(y).mean(-1), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(y).std(-1), 1.0, atol=0.1)


def test_fft_block_dropout_rng():
    block = FFTBlock(d_model=16, n_heads=2, ffn_dim=32, dropout=0.5)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 16))
    params = block.init(jax.random.PRNGKey(0), x)
    y1 = block.apply(params, x, None, False, rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = block.apply(params, x, None, False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # deterministic mode ignores dropout
    y3 = block.apply(params, x)
    y4 = block.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y3), np.asarray(y4))


def test_fftstack_remat_identical_grads(rng):
    """remat=True trades memory for recompute without changing any value:
    params tree, outputs, and gradients are bit-identical."""
    import jax
    import jax.numpy as jnp

    from emotts.nn.blocks import FFTStack

    kw = dict(num_layers=2, d_model=16, n_heads=2, ffn_dim=32,
              kernel_sizes=(3, 1), dropout=0.0)
    m0, m1 = FFTStack(**kw), FFTStack(remat=True, **kw)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    v = m0.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), x)
    )

    def loss(m, p):
        return jnp.sum(m.apply(p, x) ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(v)
    g1 = jax.grad(lambda p: loss(m1, p))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
