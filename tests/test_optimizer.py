"""AdamW moment-storage-dtype tests (emotts.train.state.make_optimizer).

The reference uses torch.optim.AdamW with fp32 state (rank_model/train.py:223,
fastspeech2/train.py:232).  This framework stores the Adam moments in a
configurable dtype (``train.moment_dtype``, default bfloat16 — the update
fusion is HBM-bound; see BENCH_NOTES.md).  These tests pin:

* fp32-moment path == optax.adamw exactly (it IS optax.adamw),
* bf16-moment path tracks fp32 AdamW to a small fraction of one lr-step,
* the state tree is optax-shaped, so checkpoints restore across a
  moment_dtype config change (Orbax casts leaves to the template dtype).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from emotts.train.state import create_train_state, make_optimizer
from emotts.utils.config import TrainConfig


def _params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
        "b": jnp.ones((64,), jnp.float32),
        "k": jnp.asarray(rng.standard_normal((3, 1, 64)), jnp.float32),
    }


def _grads(params, seed=1):
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.01, jnp.float32),
        params,
    )


def _run(tx, params, n=20):
    state = tx.init(params)
    for i in range(n):
        g = _grads(params, seed=100 + i)
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


def test_fp32_moments_match_optax_adamw():
    cfg = TrainConfig(learning_rate=1e-3, weight_decay=1e-2,
                      moment_dtype="float32")
    ref = optax.adamw(learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-8,
                      weight_decay=1e-2)
    p_a, _ = _run(make_optimizer(cfg), _params())
    p_b, _ = _run(ref, _params())
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_moments_track_fp32_adamw():
    lr = 1e-3
    cfg32 = TrainConfig(learning_rate=lr, weight_decay=1e-2,
                        moment_dtype="float32")
    cfg16 = TrainConfig(learning_rate=lr, weight_decay=1e-2,
                        moment_dtype="bfloat16")
    p32, _ = _run(make_optimizer(cfg32), _params())
    p16, s16 = _run(make_optimizer(cfg16), _params())
    drift = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(p16))
    )
    # bf16 moment rounding: a few percent of ONE lr-step after 20 steps
    assert drift < 0.1 * lr, drift
    # moments really are stored compact
    for leaf in jax.tree.leaves(s16[0].mu) + jax.tree.leaves(s16[0].nu):
        assert leaf.dtype == jnp.bfloat16


def test_state_tree_matches_optax_shape():
    """Same treedef as optax.adamw => checkpoints restore across the
    moment_dtype config change (restore casts leaves to template dtype)."""
    params = _params()
    cfg16 = TrainConfig(moment_dtype="bfloat16")
    cfg32 = TrainConfig(moment_dtype="float32")
    s16 = make_optimizer(cfg16).init(params)
    s32 = make_optimizer(cfg32).init(params)
    assert jax.tree.structure(s16) == jax.tree.structure(s32)
    # ScaleByAdamState in slot 0 both ways
    assert isinstance(s16[0], optax.ScaleByAdamState)
    assert isinstance(s32[0], optax.ScaleByAdamState)


@pytest.mark.parametrize("on_disk,template", [("float32", "bfloat16"),
                                              ("bfloat16", "float32")])
def test_checkpoint_restores_across_moment_dtype(tmp_path, on_disk, template):
    import orbax.checkpoint as ocp

    from emotts.train.state import restore_with_rng_compat

    params = _params()
    save_state = create_train_state(params, make_optimizer(
        TrainConfig(moment_dtype=on_disk)), seed=0)
    path = tmp_path / "state"
    ocp.PyTreeCheckpointer().save(path, jax.device_get(save_state))

    class _Ckpt:  # the trainers' CheckpointManager surface
        def restore(self, tmpl):
            return ocp.PyTreeCheckpointer().restore(path, item=tmpl)

    tmpl = create_train_state(params, make_optimizer(
        TrainConfig(moment_dtype=template)), seed=0)
    restored = restore_with_rng_compat(_Ckpt(), jax.device_get(tmpl))
    for got, want in zip(jax.tree.leaves(restored.opt_state[0].mu),
                         jax.tree.leaves(tmpl.opt_state[0].mu)):
        assert got.dtype == want.dtype
    assert int(restored.step) == 0
