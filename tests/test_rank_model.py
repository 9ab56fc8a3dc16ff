"""RankModel / IntensityExtractor / rank loss tests.

The loss test cross-checks our JAX loss against an independent PyTorch
computation of the same published formula (mixup CE + RankNet BCE) to pin
the exact reference semantics (batch-mean CE weighted per-sample by λ).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotts.losses import rank_loss
from emotts.nn import IntensityExtractor, RankModel

B, T, N_MELS, N_EMO = 3, 24, 16, 5


def tiny_model():
    return RankModel(
        n_mels=N_MELS, n_heads=2, n_emotions=N_EMO, n_layers=2,
        hidden_dim=32, kernel_size=9, ffn_mult=2, dropout=0.1,
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    rng = jax.random.PRNGKey(0)
    emo_x = jax.random.normal(rng, (B, T, N_MELS + 2))
    neu_x = jax.random.normal(jax.random.PRNGKey(1), (B, T, N_MELS + 2))
    emotions = jnp.array([1, 2, 3])
    lengths = jnp.array([24, 20, 16])
    params = model.init(
        {"params": rng, "mixup": jax.random.PRNGKey(2)},
        emo_x, neu_x, emotions, lengths,
    )
    return model, params, (emo_x, neu_x, emotions, lengths)


def test_forward_contract(model_and_params):
    model, params, (emo_x, neu_x, emotions, lengths) = model_and_params
    lambdas = jnp.stack([jnp.linspace(0, 1, B)] * 2)
    out = model.apply(params, emo_x, neu_x, emotions, lengths, lambdas)
    lam_i, lam_j, ii, ij, hi, hj, ri, rj = out
    assert lam_i.shape == (B, 1, 1)
    assert ii.shape == (B, T, N_EMO)
    assert hi.shape == (B, N_EMO)
    assert ri.shape == (B,)
    # λ=identical for both branches ⇒ identical outputs
    np.testing.assert_allclose(np.asarray(ri), np.asarray(rj), rtol=1e-5, atol=1e-6)


def test_padded_frames_zeroed(model_and_params):
    model, params, (emo_x, neu_x, emotions, lengths) = model_and_params
    lambdas = jnp.ones((2, B))
    _, _, ii, _, _, _, _, _ = model.apply(
        params, emo_x, neu_x, emotions, lengths, lambdas
    )
    ii = np.asarray(ii)
    # the classifier adds a bias, so "zeroed frames" means the classifier of
    # a zero vector — constant across padded frames
    pad_rows = ii[1, 20:]  # sample 1 has length 20
    assert np.allclose(pad_rows, pad_rows[0:1], atol=1e-6)


def test_mixup_lambda_extremes(model_and_params):
    """λ=1 ⇒ pure emotional input; λ=0 ⇒ pure neutral input."""
    model, params, (emo_x, neu_x, emotions, lengths) = model_and_params
    ones = jnp.ones((2, B))
    zeros = jnp.zeros((2, B))
    out_emo = model.apply(params, emo_x, neu_x, emotions, lengths, ones)
    out_emo2 = model.apply(params, emo_x, emo_x, emotions, lengths, ones)
    np.testing.assert_allclose(
        np.asarray(out_emo[6]), np.asarray(out_emo2[6]), rtol=1e-5, atol=1e-6
    )
    out_neu = model.apply(params, emo_x, neu_x, emotions, lengths, zeros)
    out_neu2 = model.apply(params, neu_x, neu_x, emotions, lengths, zeros)
    np.testing.assert_allclose(
        np.asarray(out_neu[6]), np.asarray(out_neu2[6]), rtol=1e-5, atol=1e-6
    )


def test_rank_loss_matches_torch_reference_semantics():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    b = 4
    lam_i = rng.uniform(size=b).astype(np.float32)
    lam_j = rng.uniform(size=b).astype(np.float32)
    hi = rng.standard_normal((b, N_EMO)).astype(np.float32)
    hj = rng.standard_normal((b, N_EMO)).astype(np.float32)
    ri = rng.standard_normal(b).astype(np.float32)
    rj = rng.standard_normal(b).astype(np.float32)
    y_emo = np.array([1, 2, 3, 4])

    # --- independent torch computation of the published formula ---
    t_hi, t_hj = torch.tensor(hi), torch.tensor(hj)
    t_y = torch.tensor(y_emo)
    t_y0 = torch.zeros_like(t_y)
    t_li = torch.tensor(lam_i) * F.cross_entropy(t_hi, t_y) + (
        1 - torch.tensor(lam_i)
    ) * F.cross_entropy(t_hi, t_y0)
    t_lj = torch.tensor(lam_j) * F.cross_entropy(t_hj, t_y) + (
        1 - torch.tensor(lam_j)
    ) * F.cross_entropy(t_hj, t_y0)
    t_mixup = (t_li + t_lj).mean()
    pij = torch.sigmoid(torch.tensor(ri) - torch.tensor(rj))
    lam_diff = (torch.tensor(lam_i) - torch.tensor(lam_j) + 1) / 2
    t_rank = -(
        lam_diff * torch.log(pij + 1e-8) + (1 - lam_diff) * torch.log(1 - pij + 1e-8)
    ).mean()
    t_total = 0.1 * t_mixup + 1.0 * t_rank

    # --- ours ---
    preds = (
        jnp.asarray(lam_i)[:, None, None],
        jnp.asarray(lam_j)[:, None, None],
        None,
        None,
        jnp.asarray(hi),
        jnp.asarray(hj),
        jnp.asarray(ri),
        jnp.asarray(rj),
    )
    total, parts = rank_loss(preds, jnp.asarray(y_emo), alpha=0.1, beta=1.0)
    assert float(total) == pytest.approx(float(t_total), rel=1e-5)
    assert float(parts["mixup_loss"]) == pytest.approx(float(t_mixup), rel=1e-5)
    assert float(parts["rank_loss"]) == pytest.approx(float(t_rank), rel=1e-5)


def test_rank_loss_gradient_flows(model_and_params):
    model, params, (emo_x, neu_x, emotions, lengths) = model_and_params

    def loss_fn(p):
        preds = model.apply(
            p, emo_x, neu_x, emotions, lengths, jnp.ones((2, B)) * 0.7
        )
        total, _ = rank_loss(preds, emotions)
        return total

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


def test_extractor_beta_sampling():
    """Without caller λ, the model samples from the 'mixup' RNG stream."""
    model = tiny_model()
    emo_x = jnp.zeros((B, T, N_MELS + 2))
    neu_x = jnp.ones((B, T, N_MELS + 2))
    emotions = jnp.zeros((B,), dtype=jnp.int32)
    lengths = jnp.full((B,), T)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mixup": jax.random.PRNGKey(1)},
        emo_x, neu_x, emotions, lengths,
    )
    out1 = model.apply(
        params, emo_x, neu_x, emotions, lengths, None,
        rngs={"mixup": jax.random.PRNGKey(7)},
    )
    out2 = model.apply(
        params, emo_x, neu_x, emotions, lengths, None,
        rngs={"mixup": jax.random.PRNGKey(8)},
    )
    assert not np.allclose(np.asarray(out1[0]), np.asarray(out2[0]))
    assert (np.asarray(out1[0]) >= 0).all() and (np.asarray(out1[0]) <= 1).all()
