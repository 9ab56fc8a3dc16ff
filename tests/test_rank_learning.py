"""Behavioral test: the rank model learns λ-ordering (the paper's core claim
— rank scores increase with emotional intensity)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emotts.losses import rank_loss
from emotts.nn import RankModel


def test_rank_scores_order_by_lambda():
    model = RankModel(
        n_mels=14, n_heads=2, n_emotions=3, n_layers=1,
        hidden_dim=32, kernel_size=3, ffn_mult=2, dropout=0.0,
    )
    rng = np.random.default_rng(0)
    b, t, c = 8, 16, 16

    # synthetic separable data: 'emotional' inputs carry a constant offset
    # pattern, 'neutral' inputs are plain noise
    def sample_batch(key):
        r = np.random.default_rng(key)
        neu = r.standard_normal((b, t, c)).astype(np.float32)
        emo = r.standard_normal((b, t, c)).astype(np.float32)
        emo[..., :8] += 2.0  # distinctive emotional signature
        return jnp.asarray(emo), jnp.asarray(neu)

    emotions = jnp.ones((b,), jnp.int32)
    lengths = jnp.full((b,), t, jnp.int32)
    emo0, neu0 = sample_batch(0)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mixup": jax.random.PRNGKey(1)},
        emo0, neu0, emotions, lengths,
    )
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, emo, neu, key):
        def loss_fn(p):
            preds = model.apply(
                p, emo, neu, emotions, lengths, None,
                rngs={"mixup": key},
            )
            total, _ = rank_loss(preds, emotions, alpha=0.1, beta=1.0)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(150):
        emo, neu = sample_batch(i % 10)
        params, opt_state, loss = step(
            params, opt_state, emo, neu, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # after training: rank scores must increase monotonically with λ
    emo, neu = sample_batch(99)
    lam_grid = [0.0, 0.25, 0.5, 0.75, 1.0]
    scores = []
    for lam in lam_grid:
        lambdas = jnp.full((2, b), lam)
        preds = model.apply(params, emo, neu, emotions, lengths, lambdas)
        scores.append(float(np.asarray(preds[6]).mean()))
    diffs = np.diff(scores)
    # allow one tiny violation; overall trend must be strictly increasing
    assert scores[-1] > scores[0], scores
    assert (diffs > 0).sum() >= len(diffs) - 1, scores
