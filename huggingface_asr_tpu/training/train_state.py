"""Train state with gradient-anomaly accounting.

TPU-native version of the reference's GradAwareTrainer (reference:
src/utilities/training_utils.py:78-115): steps whose global grad-norm exceeds
a threshold or contains non-finite values are cancelled *inside* the compiled
step (no host round-trip), and counted for observability.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class AsrTrainState(train_state.TrainState):
    dropout_rng: jax.Array = None
    skipped_steps: jnp.ndarray = None  # grad-norm guard rejections
    nonfinite_steps: jnp.ndarray = None  # NaN/Inf guard rejections

    @classmethod
    def create_with_guards(cls, *, apply_fn, params, tx, dropout_rng):
        return cls.create(
            apply_fn=apply_fn,
            params=params,
            tx=tx,
            dropout_rng=dropout_rng,
            skipped_steps=jnp.zeros((), jnp.int32),
            nonfinite_steps=jnp.zeros((), jnp.int32),
        )

    def apply_gradients_guarded(self, *, grads, max_grad_norm_guard: float = 100.0):
        """Apply gradients unless the global norm is anomalous; returns
        (new_state, grad_norm, applied_flag)."""
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        ok = finite & (gnorm < max_grad_norm_guard)

        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)

        sel = lambda a, b: jax.tree.map(lambda x, y: jnp.where(ok, x, y), a, b)
        state = self.replace(
            step=self.step + 1,
            params=sel(new_params, self.params),
            opt_state=sel(new_opt_state, self.opt_state),
            skipped_steps=self.skipped_steps + jnp.where(ok, 0, 1),
            nonfinite_steps=self.nonfinite_steps + jnp.where(finite, 0, 1),
        )
        return state, gnorm, ok
