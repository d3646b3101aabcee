"""Optimizers and LR schedules.

Mirrors the reference's training configuration surface (HF Trainer args used
in recipes: AdamW, linear/cosine warmup schedules, weight decay, grad clip —
e.g. recipes/librispeech/train_ctc.sh:44-86) on top of optax.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-3
    lr_scheduler_type: str = "linear"  # linear | cosine | constant | inverse_sqrt
    warmup_steps: int = 5000
    total_steps: int = 100_000
    weight_decay: float = 1e-6
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 5.0
    gradient_accumulation_steps: int = 1


def make_schedule(config: OptimizerConfig) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, config.learning_rate, config.warmup_steps)
    decay_steps = max(config.total_steps - config.warmup_steps, 1)
    if config.lr_scheduler_type == "linear":
        decay = optax.linear_schedule(config.learning_rate, 0.0, decay_steps)
    elif config.lr_scheduler_type == "cosine":
        decay = optax.cosine_decay_schedule(config.learning_rate, decay_steps)
    elif config.lr_scheduler_type == "constant":
        decay = optax.constant_schedule(config.learning_rate)
    elif config.lr_scheduler_type == "inverse_sqrt":
        decay = lambda step: config.learning_rate * jnp.sqrt(
            config.warmup_steps / jnp.maximum(step + config.warmup_steps, 1)
        )
    else:
        raise ValueError(config.lr_scheduler_type)
    return optax.join_schedules([warmup, decay], [config.warmup_steps])


def _decay_mask(params):
    """No weight decay for biases, LayerNorm scales, or 1-D params (HF convention)."""
    import jax

    return jax.tree.map(lambda p: p.ndim > 1, params)


def make_optimizer(config: OptimizerConfig) -> optax.GradientTransformation:
    schedule = make_schedule(config)
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(
            schedule,
            b1=config.adam_beta1,
            b2=config.adam_beta2,
            eps=config.adam_epsilon,
            weight_decay=config.weight_decay,
            mask=_decay_mask,
        ),
    )
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, config.gradient_accumulation_steps)
    return tx


def freeze_mask(params, frozen_prefixes):
    """Trainability mask: False for params whose path starts with a frozen
    prefix ('/'-joined keys). Covers the reference's freeze_encoder /
    freeze_llm / freeze_asr switches (e.g. freeze 'wav2vec2/encoder',
    'decoder', 'encoder')."""
    import jax

    def visit(path, leaf):
        joined = "/".join(str(getattr(k, "key", k)) for k in path)
        return not any(
            joined == p or joined.startswith(p + "/") for p in frozen_prefixes
        )

    return jax.tree_util.tree_map_with_path(visit, params)


def make_optimizer_with_frozen(
    config: OptimizerConfig, params, frozen_prefixes
) -> optax.GradientTransformation:
    """Optimizer that applies zero updates to frozen subtrees."""
    tx = make_optimizer(config)
    if not frozen_prefixes:
        return tx
    mask = freeze_mask(params, frozen_prefixes)
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), jax.tree.map(lambda t: not t, mask)),
    )
