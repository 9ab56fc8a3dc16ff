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
    rank_model/train.py:223 and fastspeech2/train.py:232)."""
    return optax.adamw(
        learning_rate=cfg.learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=cfg.weight_decay,
    )


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
    return restored


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
