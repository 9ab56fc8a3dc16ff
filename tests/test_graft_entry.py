"""Driver-contract regression: entry() compiles and dryrun_multichip runs
on the 8-virtual-device CPU mesh."""

import jax
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))


def test_entry_compiles_tiny():
    # the full-size entry() is heavy on CPU; compile-check a reduced clone
    import __graft_entry__ as g
    import jax.numpy as jnp

    from emotts.train.fs2_trainer import build_fastspeech2, init_fs2_variables

    cfg = g._tiny_cfg()
    model = build_fastspeech2(cfg)
    variables = init_fs2_variables(cfg, model, 0)
    phonemes = jnp.ones((2, 8), jnp.int32)
    speakers = jnp.zeros((2,), jnp.int32)
    intensity = jnp.zeros((2, 8, cfg.n_emotions))

    def fn(p, s, i):
        preds = model.apply(variables, p, s, intensity=i, max_mel_len=64)
        return preds[0], preds[7]

    mel, lens = jax.jit(fn)(phonemes, speakers, intensity)
    assert mel.shape == (2, 64, 80)
    assert np.isfinite(np.asarray(mel)).all()
