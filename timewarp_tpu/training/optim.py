"""Optimizers and LR schedules.

Reference semantics: Adam with linear warmup (reference:
utilities/training_utils.py:356-384 -- lr * min(1, step/warmup) then
constant), optional weight decay, gradient clipping
(utils/training_utils.py:131), and a loss-plateau schedule
(utils/deepspeed_lr_scheduler.py:52-141) implemented host-side in the
training loop as a multiplicative factor.
"""
import dataclasses
from typing import Optional

import optax


def linear_warmup_schedule(
    learning_rate: float,
    warmup_steps: int,
    decay_steps: Optional[int] = None,
    min_lr_factor: float = 0.01,
):
    """Reference warmup (lr * min(1, step/warmup) then constant), optionally
    followed by cosine decay to ``learning_rate * min_lr_factor`` over
    ``decay_steps`` total steps -- the constant tail leaves precision on the
    table for the stiff-mode fit the MH acceptance depends on."""

    def schedule(step):
        import jax.numpy as jnp

        step = optax.safe_increment(step)
        lr = learning_rate * jnp.minimum(1.0, step / max(warmup_steps, 1))
        if decay_steps:
            t = jnp.clip(
                (step - warmup_steps) / max(decay_steps - warmup_steps, 1), 0.0, 1.0
            )
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
            lr = lr * (min_lr_factor + (1.0 - min_lr_factor) * cos)
        return lr

    return schedule


@dataclasses.dataclass
class OptimizerConfig:
    name: str = "adam"  # adam | adamw | lamb | sgd
    learning_rate: float = 1e-4
    warmup_steps: int = 1000
    weight_decay: float = 0.0
    clip_grad_norm: Optional[float] = None
    # Cosine decay to learning_rate * min_lr_factor over decay_steps total
    # steps (None = reference behaviour: constant after warmup).
    decay_steps: Optional[int] = None
    min_lr_factor: float = 0.01


def build_optimizer(config: OptimizerConfig) -> optax.GradientTransformation:
    schedule = linear_warmup_schedule(
        config.learning_rate,
        config.warmup_steps,
        config.decay_steps,
        config.min_lr_factor,
    )
    if config.name == "adam":
        if config.weight_decay:
            core = optax.adamw(schedule, weight_decay=config.weight_decay)
        else:
            core = optax.adam(schedule)
    elif config.name == "adamw":
        core = optax.adamw(schedule, weight_decay=config.weight_decay)
    elif config.name == "lamb":
        core = optax.lamb(schedule, weight_decay=config.weight_decay)
    elif config.name == "sgd":
        core = optax.sgd(schedule)
    else:
        raise ValueError(f"Unknown optimizer {config.name!r}")

    chain = []
    if config.clip_grad_norm:
        chain.append(optax.clip_by_global_norm(config.clip_grad_norm))
    chain.append(core)
    # An outer multiplicative factor driven host-side by the plateau
    # controller (1.0 by default); inject_hyperparams makes it a leaf of the
    # optimizer state that the loop can overwrite between steps.
    chain.append(
        optax.inject_hyperparams(lambda plateau_factor: optax.scale(plateau_factor))(
            plateau_factor=1.0
        )
    )
    return optax.chain(*chain)
