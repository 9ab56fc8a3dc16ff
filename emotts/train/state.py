"""Train state: params + optimizer + step + PRNG key.

Unlike the reference's weights-only ``torch.save(model.state_dict())``
(SURVEY.md §5: no optimizer state, step counter, or RNG state anywhere), the
full state checkpoints here, making training preemption-safe and exactly
resumable.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from emotts.utils.config import TrainConfig


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # () int32
    params: Any
    opt_state: Any
    rng: jax.Array  # base PRNG key DATA (raw uint32; see next_rngs)
    batch_stats: Any = None  # for models with BatchNorm (PostNet)
    # PRNG implementation, static (not a traced leaf).  "rbg" uses the TPU's
    # hardware RNG — measured 26% faster rank fwd+bwd than threefry (the
    # dropout-mask generation is a real cost at these model sizes).  The key
    # is stored as raw uint32 key data so Orbax checkpoints never see an
    # extended PRNG dtype.
    rng_impl: str = struct.field(pytree_node=False, default="rbg")

    def next_rngs(self, *names: str):
        """Per-step RNG streams derived from (base key, step)."""
        base = jax.random.wrap_key_data(self.rng, impl=self.rng_impl)
        key = jax.random.fold_in(base, self.step)
        keys = jax.random.split(key, len(names))
        return dict(zip(names, keys))


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW with torch-default hyperparameters (betas 0.9/0.999, eps 1e-8,
    decoupled weight decay; reference uses torch.optim.AdamW at
    rank_model/train.py:223 and fastspeech2/train.py:232).

    ``cfg.moment_dtype`` selects the storage dtype of the Adam moments.  The
    update fusion is HBM-bandwidth-bound (28 B/param/step with fp32 m+v);
    storing both moments in bf16 cuts that to 20 B/param.  All arithmetic
    (moment EMAs, bias correction, the update itself) stays fp32 — only the
    carried state is rounded, so the numerics match fp32 Adam to ~3 decimal
    digits per step while the fusion runs ~40% faster (measured; see
    BENCH_NOTES.md)."""
    if cfg.moment_dtype in (None, "", "float32"):
        return optax.adamw(
            learning_rate=cfg.learning_rate,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
        )
    moment_dtype = jnp.dtype(cfg.moment_dtype)
    return optax.chain(
        _scale_by_adam_compact(0.9, 0.999, 1e-8, moment_dtype),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale(-cfg.learning_rate),
    )


def _scale_by_adam_compact(
    b1: float, b2: float, eps: float, moment_dtype
) -> optax.GradientTransformation:
    """Adam scaling with moments *stored* in ``moment_dtype`` (fp32 math).

    Identical state tree structure to ``optax.scale_by_adam`` (an
    ``optax.ScaleByAdamState``), so checkpoints restore across the two —
    Orbax restores by tree structure and casts leaves to the template dtype.
    """

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=moment_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        # fp32 bias-correction scalars (count is a traced int32 scalar)
        c1 = 1.0 - jnp.power(jnp.float32(b1), count.astype(jnp.float32))
        c2 = 1.0 - jnp.power(jnp.float32(b2), count.astype(jnp.float32))

        def one(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            u = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
            return u, m32.astype(moment_dtype), v32.astype(moment_dtype)

        flat = jax.tree.map(one, grads, state.mu, state.nu)
        updates = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda t: isinstance(t, tuple))
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


_KEY_DATA_SHAPES = {2: "threefry2x32", 4: "rbg"}


def restore_with_rng_compat(ckpt, template: TrainState) -> "TrainState | None":
    """Restore a checkpoint, tolerating a different PRNG impl on disk.

    The stored rng is raw key DATA whose shape identifies the impl
    ((2,) threefry, (4,) rbg).  If the template's impl doesn't match the
    checkpoint (e.g. a pre-rbg checkpoint resumed under the new default),
    retry with the on-disk impl and carry it forward on the restored state —
    preemption-safe resume survives the config change.
    """
    try:
        restored = ckpt.restore(template)
    except Exception:
        # some checkpointers hard-fail on the rng shape mismatch: retry with
        # the other impl's template shape
        alt_impl = next(
            impl
            for n, impl in _KEY_DATA_SHAPES.items()
            if n != template.rng.shape[-1]
        )
        alt = template.replace(
            rng=jax.random.key_data(jax.random.key(0, impl=alt_impl)),
            rng_impl=alt_impl,
        )
        restored = ckpt.restore(jax.device_get(alt))
    if restored is None:
        return None
    # the authoritative impl is whatever shape actually came off disk
    disk_impl = _KEY_DATA_SHAPES.get(int(restored.rng.shape[-1]))
    if disk_impl is not None and disk_impl != restored.rng_impl:
        restored = restored.replace(rng_impl=disk_impl)
    # Orbax restores on-disk dtypes verbatim; align to the template so a
    # checkpoint written under a different train.moment_dtype config resumes
    # cleanly (fp32 moments -> bf16 template and vice versa).  Shapes are
    # left alone (the rng-impl compat above owns the one legitimate shape
    # difference).
    def _align(tpl, got):
        if (
            hasattr(tpl, "dtype")
            and hasattr(got, "dtype")
            and tpl.dtype != got.dtype
            and tpl.shape == got.shape
        ):
            return got.astype(tpl.dtype)
        return got

    aligned_opt = jax.tree.map(_align, template.opt_state, restored.opt_state)
    return restored.replace(opt_state=aligned_opt)


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    seed: int,
    batch_stats: Any = None,
    rng_impl: str = "rbg",
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=jax.random.key_data(jax.random.key(seed, impl=rng_impl)),
        batch_stats=batch_stats,
        rng_impl=rng_impl,
    )
