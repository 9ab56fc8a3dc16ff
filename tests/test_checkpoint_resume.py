"""Checkpoint/resume tests: full train state (params+opt+step+rng) round-trips."""

import jax
import numpy as np
import pytest

from emotts.data import build_fs2_splits, build_rank_pair_lists, preprocess_all
from emotts.parallel.mesh import make_mesh
from emotts.train.rank_trainer import RankTrainer
from tests.synthetic_corpus import make_corpus


@pytest.fixture(scope="module")
def corpus_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    cfg = make_corpus(str(root), utts_per_emotion=5)
    preprocess_all(cfg, verbose=False)
    build_rank_pair_lists(cfg)
    build_fs2_splits(cfg)
    cfg.rank_model.n_encoder_layers = 1
    cfg.rank_model.hidden_dim = 32
    cfg.rank_model.ffn_mult = 2
    cfg.train_rank.batch_size = 4
    cfg.train_rank.n_epochs = 1
    cfg.train_rank.compute_dtype = "float32"
    return cfg


def test_rank_resume_roundtrip(corpus_cfg, tmp_path):
    cfg = corpus_cfg
    mesh = make_mesh(devices=jax.devices()[:1])
    trainer = RankTrainer(cfg, mesh=mesh)
    exp = trainer.fit(exp_path=str(tmp_path / "exp"), verbose=False)

    step_after = int(jax.device_get(trainer.state.step))
    assert step_after > 0
    params_after = jax.device_get(trainer.state.params)

    # a brand-new trainer restores the exact state
    fresh = RankTrainer(cfg, mesh=mesh)
    assert int(jax.device_get(fresh.state.step)) == 0
    assert fresh.restore(exp)
    assert int(jax.device_get(fresh.state.step)) == step_after
    restored = jax.device_get(fresh.state.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_after), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(a, b)
    # optimizer state restored too (non-trivial second moments)
    opt_leaves = jax.tree_util.tree_leaves(jax.device_get(fresh.state.opt_state))
    assert any(np.abs(l).max() > 0 for l in opt_leaves if hasattr(l, "max"))


def test_restore_missing_returns_false(corpus_cfg, tmp_path):
    cfg = corpus_cfg
    mesh = make_mesh(devices=jax.devices()[:1])
    trainer = RankTrainer(cfg, mesh=mesh)
    assert trainer.restore(str(tmp_path / "nonexistent")) is False


def test_resume_across_rng_impl_change(tmp_path):
    """A checkpoint written under threefry resumes under the rbg default
    (and vice versa): the stored key-data shape differs (2,) vs (4,), and
    restore must fall back to the on-disk impl instead of failing."""
    import jax
    import numpy as np
    import optax

    from emotts.train.checkpoint import CheckpointManager
    from emotts.train.state import (
        create_train_state,
        restore_with_rng_compat,
    )

    params = {"w": np.ones((4, 4), np.float32)}
    tx = optax.adamw(1e-3)
    old = create_train_state(params, tx, seed=7, rng_impl="threefry2x32")
    old = old.replace(step=jax.numpy.asarray(11, jax.numpy.int32))
    mgr = CheckpointManager(str(tmp_path / "exp"))
    mgr.save(old)
    mgr.close()

    new_template = create_train_state(params, tx, seed=0, rng_impl="rbg")
    mgr2 = CheckpointManager(str(tmp_path / "exp"))
    restored = restore_with_rng_compat(mgr2, jax.device_get(new_template))
    mgr2.close()
    assert restored is not None
    assert int(restored.step) == 11
    assert restored.rng_impl == "threefry2x32"
    assert restored.rng.shape[-1] == 2
    # the restored state's rng streams still work
    keys = restored.next_rngs("dropout")
    assert "dropout" in keys
