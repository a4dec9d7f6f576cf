"""Langevin dynamics via lax.scan -- the on-device MD engine.

Replaces the reference's OpenMM integration (reference: simulation/md.py:98-125
LangevinIntegrator / LangevinMiddleIntegrator at T=310K, friction 0.3/ps,
dt=0.5fs) for trajectory generation, burn-in, and the interleaved openmm
steps of the samplers. The BAOAB ("middle") discretization matches
LangevinMiddleIntegrator; the legacy scheme is available for parity with
older datasets.
"""
import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from timewarp_tpu.physics.constants import (
    DEFAULT_FRICTION,
    DEFAULT_TEMPERATURE,
    DEFAULT_TIMESTEP,
    kbT,
)
from timewarp_tpu.physics.energy import potential_energy
from timewarp_tpu.physics.system import AmberSystem


@dataclasses.dataclass
class LangevinConfig:
    temperature: float = DEFAULT_TEMPERATURE  # K
    friction: float = DEFAULT_FRICTION  # 1/ps
    timestep: float = DEFAULT_TIMESTEP  # ps


def langevin_step_fn(
    system: AmberSystem, config: LangevinConfig
) -> Callable:
    """One BAOAB step: (coords, velocs, key) -> (coords, velocs).

    B: v += dt f/m ; A: x += dt/2 v ; O: Ornstein-Uhlenbeck noise ;
    A: x += dt/2 v. (The "middle" scheme.)
    """
    dt = config.timestep
    gamma = config.friction
    kT = kbT(config.temperature)
    m = system.masses[:, None]
    a = jnp.exp(-gamma * dt)
    b = jnp.sqrt(1.0 - a * a)
    sigma = jnp.sqrt(kT / m)

    grad_fn = jax.grad(lambda c: potential_energy(system, c))

    def step(coords, velocs, key):
        f = -grad_fn(coords)
        velocs = velocs + dt * f / m
        coords = coords + 0.5 * dt * velocs
        noise = jax.random.normal(key, velocs.shape, velocs.dtype)
        velocs = a * velocs + b * sigma * noise
        coords = coords + 0.5 * dt * velocs
        return coords, velocs

    return step


def run_segment(
    system: AmberSystem,
    coords: jnp.ndarray,
    velocs: jnp.ndarray,
    key: jax.Array,
    num_steps: int,
    config: Optional[LangevinConfig] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate num_steps Langevin steps in one fused lax.scan."""
    config = config or LangevinConfig()
    step = langevin_step_fn(system, config)

    def body(carry, key):
        c, v = carry
        c, v = step(c, v, key)
        return (c, v), None

    keys = jax.random.split(key, num_steps)
    (coords, velocs), _ = jax.lax.scan(body, (coords, velocs), keys)
    return coords, velocs


def sample_trajectory(
    system: AmberSystem,
    coords: jnp.ndarray,
    velocs: jnp.ndarray,
    key: jax.Array,
    num_frames: int,
    steps_per_frame: int,
    config: Optional[LangevinConfig] = None,
):
    """Return (coords [T,V,3], velocs [T,V,3]) sampled every steps_per_frame
    steps (the analogue of the reference's NPZ-reporter sampling loop,
    reference: simulation/md.py:416-476)."""
    config = config or LangevinConfig()
    step = langevin_step_fn(system, config)

    def frame(carry, key):
        def body(c, k):
            coords, velocs = c
            return step(coords, velocs, k), None

        keys = jax.random.split(key, steps_per_frame)
        carry, _ = jax.lax.scan(body, carry, keys)
        return carry, carry

    keys = jax.random.split(key, num_frames)
    _, (traj_coords, traj_velocs) = jax.lax.scan(frame, (coords, velocs), keys)
    return traj_coords, traj_velocs


def maxwell_boltzmann_velocities(
    system: AmberSystem, key: jax.Array, temperature: float = DEFAULT_TEMPERATURE
) -> jnp.ndarray:
    sigma = jnp.sqrt(kbT(temperature) / system.masses)[:, None]
    return sigma * jax.random.normal(key, (system.num_atoms, 3))
