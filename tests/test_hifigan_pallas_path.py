"""The Pallas-resblock vocoder path must be checkpoint-compatible and
numerically equal to the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from emotts.nn.hifigan import HiFiGANGenerator

SMALL = dict(
    in_channels=8,
    upsample_initial_channel=16,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    resblock_kernel_sizes=(3,),
    resblock_dilations=((1, 3),),
)


def test_pallas_path_matches_xla_path():
    gen_xla = HiFiGANGenerator(**SMALL)
    gen_pl = HiFiGANGenerator(**SMALL, use_pallas_resblocks=True)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 8))
    params = gen_xla.init(jax.random.PRNGKey(0), mel)
    # identical param trees → checkpoints interchange
    params_pl = gen_pl.init(jax.random.PRNGKey(0), mel)
    s1 = jax.tree_util.tree_structure(params)
    s2 = jax.tree_util.tree_structure(params_pl)
    assert s1 == s2

    w_xla = np.asarray(gen_xla.apply(params, mel))
    w_pl = np.asarray(gen_pl.apply(params, mel))
    np.testing.assert_allclose(w_pl, w_xla, rtol=1e-4, atol=1e-5)


def test_time_packed_path_matches_xla_path():
    gen_xla = HiFiGANGenerator(**SMALL)
    gen_tp = HiFiGANGenerator(**SMALL, time_packed_resblocks=True)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 8))
    params = gen_xla.init(jax.random.PRNGKey(0), mel)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        gen_tp.init(jax.random.PRNGKey(0), mel)
    )
    w_xla = np.asarray(gen_xla.apply(params, mel))
    w_tp = np.asarray(gen_tp.apply(params, mel))
    np.testing.assert_allclose(w_tp, w_xla, rtol=1e-4, atol=1e-5)
