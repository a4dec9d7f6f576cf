"""Training losses over conditional density models.

Functional counterparts of the reference's loss layer (reference:
losses.py:305-788). Each loss is a pure function
``loss_fn(model, params, batch, rng) -> (scalar, metrics_dict)`` so it jits
and differentiates cleanly; the (loss, model) multimethod dispatch of the
reference becomes a registry keyed by config name.

Energy-based losses (Acceptance/Energy) take an ``EnergyModel`` -- the
pure-JAX AMBER potential (timewarp_tpu.physics) -- so the whole objective,
including the MD energy, is a single differentiable XLA program. The
reference had to cross into OpenMM/C++ for these (losses.py:359-664).
"""
import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from timewarp_tpu.data.batch import DenseBatch


@dataclasses.dataclass
class LossScheduleConfig:
    """Geometric annealing of the convex-combination softmax weights
    (reference: GeometricLossSchedule, losses.py:824-943 + LossScheduleConfig
    loss_configs.py).

    Every ``every`` steps the pre-softmax weights are multiplied by
    ``factor`` (scalar or per-loss tuple) while the cumulative factor stays
    within [minimum, maximum]. The reference mutates the loss module from
    the host loop; here the cumulative factor is a pure function of the step
    counter, so the whole schedule lives inside the jitted train step.
    """

    every: int = 1
    factor: Tuple[float, ...] = (1.0,)
    maximum: float = float("inf")
    minimum: float = 0.0


@dataclasses.dataclass
class LossConfig:
    """Mirrors reference loss_configs.py:65-69 with nested options."""

    name: str = "nll"  # nll | acceptance | energy | bonded | nll_acceptance | ...
    random_velocs: bool = True
    # acceptance-loss options (reference: loss_configs.py NLLAndAcceptanceLossConfig)
    beta: float = 0.0
    clamp: bool = False
    num_samples: int = 1
    high_energy_threshold: float = -1.0
    # convex combination weighting for composite losses: fixed weights, or
    # softmax(pre_softmax_weights) optionally annealed by `schedule`
    # (reference: ConvexCombinationLoss, losses.py:731-788)
    weights: Optional[Tuple[float, ...]] = None
    pre_softmax_weights: Optional[Tuple[float, ...]] = None
    schedule: Optional[LossScheduleConfig] = None


def scheduled_weights(
    pre_softmax_weights: Tuple[float, ...],
    schedule: Optional[LossScheduleConfig],
    step: jnp.ndarray,
) -> jnp.ndarray:
    """Softmax combination weights at a given train step.

    Pure-function equivalent of the reference's mutate-in-place
    ``loss_schedule_step`` (losses.py:908-943): after k = step // every
    applications the pre-softmax weights are ``w0 * factor^k``, with the
    cumulative factor's *magnitude* clamped elementwise to
    [minimum, maximum]. This is an intentional, cleaner approximation of the
    reference's gate: the reference stops multiplying (globally, for all
    losses at once) once any cumulative factor exits the band, so it can
    overshoot ``maximum`` by one application; the elementwise magnitude
    clamp never overshoots and freezes each loss independently.

    Handles negative factors (the reference docstring documents
    factor=[-1, 1]): the sign alternates with parity of k while the clamp
    applies to |factor|^k only, so (-1)^odd stays -1 instead of being
    clamped to 0. k is computed in integer arithmetic to stay exact past
    2^24 steps."""
    w0 = jnp.asarray(pre_softmax_weights, jnp.float32)
    if schedule is None:
        return jax.nn.softmax(w0)
    factor = jnp.broadcast_to(jnp.asarray(schedule.factor, jnp.float32), w0.shape)
    k = jnp.asarray(step, jnp.int32) // schedule.every
    sign = jnp.where((factor < 0) & (k % 2 == 1), -1.0, 1.0)
    magnitude = jnp.clip(
        jnp.abs(factor) ** k.astype(jnp.float32), schedule.minimum, schedule.maximum
    )
    return jax.nn.softmax(w0 * sign * magnitude)


def convex_combination(
    loss_fns,
    weights: Optional[Tuple[float, ...]] = None,
    pre_softmax_weights: Optional[Tuple[float, ...]] = None,
    schedule: Optional[LossScheduleConfig] = None,
) -> Callable:
    """Weighted mixture of losses (reference: ConvexCombinationLoss,
    losses.py:731-788). Either fixed ``weights`` or softmax-normalized
    ``pre_softmax_weights`` (optionally annealed by ``schedule``)."""
    assert (weights is None) != (pre_softmax_weights is None), (
        "exactly one of weights / pre_softmax_weights must be given"
    )

    def fn(model, params, batch, rng, step=0, energy_system=None):
        if weights is not None:
            w = jnp.asarray(weights, jnp.float32)
        else:
            w = scheduled_weights(pre_softmax_weights, schedule, step)
        keys = jax.random.split(rng, len(loss_fns))
        total, metrics = 0.0, {}
        # Only forward energy_system when set, so member losses with the
        # plain (model, params, batch, rng, step) signature keep working.
        kwargs = {} if energy_system is None else {"energy_system": energy_system}
        for i, (lf, k) in enumerate(zip(loss_fns, keys)):
            li, mi = lf(model, params, batch, k, step=step, **kwargs)
            total = total + w[i] * li
            metrics.update(mi)
            metrics[f"loss_weight_{i}"] = w[i]
        metrics["combined_loss"] = total
        return total, metrics

    return fn


def resample_velocities(rng: jax.Array, batch: DenseBatch) -> DenseBatch:
    """Draw x/y velocities from N(0, 1) (the paper's augmented training;
    reference: losses.py:332-337)."""
    k1, k2 = jax.random.split(rng)
    return batch.replace(
        atom_velocs=jax.random.normal(k1, batch.atom_velocs.shape, batch.atom_velocs.dtype),
        atom_veloc_targets=jax.random.normal(
            k2, batch.atom_veloc_targets.shape, batch.atom_veloc_targets.dtype
        ),
    )


def nll_loss(
    model,
    params,
    batch: DenseBatch,
    rng: jax.Array,
    random_velocs: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Mean per-atom negative log-likelihood (reference: losses.py:305-356).

    Dispatches on the model's canonical loss (``__call__``): per-atom NLL for
    density models, the ELBO/IWAE surrogate for the CVAE (with its latent
    RNG), MSE for point-estimate models; force-conditioned baselines receive
    the batch forces (the reference's (loss, model) multimethod,
    losses.py:218-238 + batch_to :153-205)."""
    k_vel, k_latent = jax.random.split(rng)
    if random_velocs:
        batch = resample_velocities(k_vel, batch)
    args = [batch.atom_types, batch.atom_coords, batch.atom_velocs]
    if getattr(model, "needs_forces", False):
        args.append(batch.atom_forces)
    args += [batch.atom_coord_targets, batch.atom_veloc_targets, batch.masked_elements]
    rngs = {"latent": k_latent} if getattr(model, "needs_latent_rng", False) else None
    loss = model.apply(params, *args, rngs=rngs)
    return loss, {"nll_loss": loss}


def flipped_nll_loss(model, params, batch, rng, random_velocs=True):
    """NLL on the time-reversed batch: swap (x, y) and negate velocities
    (a no-op negation under random_velocs). Reference: losses.py:667-728."""
    flip = -1.0 if not random_velocs else 1.0
    flipped = batch.replace(
        atom_coords=batch.atom_coord_targets,
        atom_velocs=flip * batch.atom_veloc_targets,
        atom_coord_targets=batch.atom_coords,
        atom_veloc_targets=flip * batch.atom_velocs,
    )
    loss, metrics = nll_loss(model, params, flipped, rng, random_velocs)
    return loss, {"flipped_" + k: v for k, v in metrics.items()}


def make_loss(config: LossConfig, energy_model=None) -> Callable:
    """Build loss_fn(model, params, batch, rng) from a config.

    Energy-based losses are attached in timewarp_tpu.physics.losses once an
    energy model for the batch's molecule is available.
    """
    if config.name == "nll":
        def fn(model, params, batch, rng, step=0, energy_system=None):
            return nll_loss(model, params, batch, rng, config.random_velocs)
        return fn
    if config.name == "flipped_nll":
        def fn(model, params, batch, rng, step=0, energy_system=None):
            k1, k2 = jax.random.split(rng)
            l1, m1 = nll_loss(model, params, batch, k1, config.random_velocs)
            l2, m2 = flipped_nll_loss(model, params, batch, k2, config.random_velocs)
            return 0.5 * (l1 + l2), {**m1, **m2}
        return fn
    if config.name in ("acceptance", "energy", "bonded", "nll_acceptance", "nll_energy", "nll_bonded"):
        from timewarp_tpu.physics.losses import make_energy_loss

        return make_energy_loss(config, energy_model)
    raise ValueError(f"Unknown loss {config.name!r}")
