"""No-MH exploration sampler.

Reference: exploration.py:124-259 -- a batch of parallel walkers accepts
every model proposal unless the energy jump exceeds a threshold or the
chirality flips (+large penalty), resampling velocities each step. On TPU
the walkers ride the batch axis of one jitted lax.scan, so W walkers x T
steps is a single device program.
"""
import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from timewarp_tpu.utils.chirality import check_symmetry_change

CHIRALITY_PENALTY = 10_000.0  # kT (reference: exploration.py energy penalty)


@dataclasses.dataclass(frozen=True)
class ExplorationConfig:
    energy_threshold: float = 300.0  # kT; reject proposals above this jump
    resample_velocs: bool = True


@struct.dataclass
class ExplorationOutputs:
    coords: jnp.ndarray  # [T, W, V, 3]
    e_pot: jnp.ndarray  # [T, W]
    accepted: jnp.ndarray  # [T, W] bool


@partial(
    jax.jit,
    static_argnames=("propose_batch_fn", "energy_fn", "num_steps", "config"),
)
def explore(
    params,
    coords0: jnp.ndarray,  # [W, V, 3] walker states
    rng: jax.Array,
    propose_batch_fn: Callable,  # (params, rng, coords [W,V,3], velocs) -> (y, yv)
    energy_fn: Callable,  # [.., V, 3] -> [..] in kT
    num_steps: int,
    config: ExplorationConfig,
    chirality_centers: Optional[jnp.ndarray] = None,
    reference_signs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, ExplorationOutputs]:
    """Run all walkers for num_steps; returns final coords and the history."""
    W = coords0.shape[0]
    e0 = energy_fn(coords0)

    def body(carry, key):
        coords, e_pot = carry
        k_v, k_p = jax.random.split(key)
        velocs = jax.random.normal(k_v, coords.shape, coords.dtype)
        y, yv = propose_batch_fn(params, k_p, coords, velocs)
        e_y = energy_fn(y)
        if chirality_centers is not None and reference_signs is not None:
            flipped = check_symmetry_change(y, chirality_centers, reference_signs)
            e_y = e_y + CHIRALITY_PENALTY * flipped
        accept = (e_y - e_pot) < config.energy_threshold
        coords = jnp.where(accept[:, None, None], y, coords)
        e_pot = jnp.where(accept, e_y, e_pot)
        return (coords, e_pot), ExplorationOutputs(
            coords=coords, e_pot=e_pot, accepted=accept
        )

    keys = jax.random.split(rng, num_steps)
    (coords, _), outputs = jax.lax.scan(body, (coords0, e0), keys)
    return coords, outputs


def make_flow_batch_proposal(model, atom_types_row, masked_row):
    """Batch-walker proposal adapter: one sample per walker.

    atom_types_row/masked_row: [V] metadata shared by all walkers.
    """

    def propose_batch_fn(params, rng, coords, velocs):
        W = coords.shape[0]
        yc, yv, _ = model.apply(
            params,
            rng,
            jnp.tile(atom_types_row[None], (W, 1)),
            coords,
            velocs,
            jnp.tile(masked_row[None], (W, 1)),
            1,
            method="conditional_sample_with_logp",
        )
        return yc[0], yv[0]

    return propose_batch_fn
