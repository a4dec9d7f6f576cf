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
import numpy as np

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
    # "middle" = BAOAB (LangevinMiddleIntegrator); "legacy" = OpenMM's
    # original LangevinIntegrator discretization, used for the reference's
    # pre-12/2021 datasets (reference: simulation/md.py:76-95,113-125).
    scheme: str = "middle"
    # OpenMM's ForceField.createSystem adds a CMMotionRemover by default
    # (removeCMMotion=True), so every reference dataset has ZERO
    # center-of-mass drift. Without this, the COM diffuses ~0.07 nm/dim
    # per 500 fs step-width -- unpredictable correlated displacement that
    # inflates the conditional entropy of every (x, y) training pair
    # (round-3 diagnosis of the validation-NLL gap).
    remove_com_motion: bool = True


def langevin_step_fn(
    system: AmberSystem, config: LangevinConfig
) -> Callable:
    """One Langevin step: (coords, velocs, key) -> (coords, velocs).

    middle/BAOAB: B: v += dt f/m ; A: x += dt/2 v ; O: Ornstein-Uhlenbeck
    noise ; A: x += dt/2 v.
    legacy: v' = a v + (1-a) f/(gamma m) + sigma sqrt(1-a^2) R ;
    x += dt v' (OpenMM LangevinIntegrator's velocity-Verlet-with-noise).
    """
    dt = config.timestep
    gamma = config.friction
    kT = kbT(config.temperature)
    m = system.masses[:, None]
    a = jnp.exp(-gamma * dt)
    b = jnp.sqrt(1.0 - a * a)
    sigma = jnp.sqrt(kT / m)

    grad_fn = jax.grad(lambda c: potential_energy(system, c))

    if config.remove_com_motion:
        # OpenMM CMMotionRemover semantics: subtract the mass-weighted mean
        # velocity (applied every step, frequency=1).
        def drop_com(velocs):
            v_com = (m * velocs).sum(axis=0, keepdims=True) / m.sum()
            return velocs - v_com

    else:

        def drop_com(velocs):
            return velocs

    if config.scheme == "middle":

        def step(coords, velocs, key):
            f = -grad_fn(coords)
            velocs = velocs + dt * f / m
            coords = coords + 0.5 * dt * velocs
            noise = jax.random.normal(key, velocs.shape, velocs.dtype)
            velocs = drop_com(a * velocs + b * sigma * noise)
            coords = coords + 0.5 * dt * velocs
            return coords, velocs

    elif config.scheme == "legacy":

        def step(coords, velocs, key):
            f = -grad_fn(coords)
            noise = jax.random.normal(key, velocs.shape, velocs.dtype)
            velocs = drop_com(
                a * velocs + (1.0 - a) * f / (gamma * m) + b * sigma * noise
            )
            coords = coords + dt * velocs
            return coords, velocs

    else:
        raise ValueError(f"unknown Langevin scheme {config.scheme!r}")

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


def log_spaced_offsets(report_interval: int, factor: int = 10) -> Tuple[int, ...]:
    """In-block record offsets of the reference's logarithmic spacing:
    {1, f, f^2, ...} capped at report_interval (reference:
    simulation/npzreporter.py:44-87 LogarithmicSpacing.stepsUntilNextReport).
    The last offset equals report_interval, i.e. the next block's start."""
    if factor <= 1:
        raise ValueError("factor must be larger than one")
    offsets = []
    o = 1
    while o < report_interval:
        offsets.append(o)
        o *= factor
    offsets.append(report_interval)
    return tuple(offsets)


def sample_trajectory_log(
    system: AmberSystem,
    coords: jnp.ndarray,
    velocs: jnp.ndarray,
    key: jax.Array,
    num_blocks: int,
    report_interval: int,
    factor: int = 10,
    config: Optional[LangevinConfig] = None,
):
    """Sample frames at steps b*RI + o, o in log_spaced_offsets(RI, factor).

    The TPU-friendly realization of the reference's LogarithmicSpacing
    reporter (simulation/npzreporter.py:44-87): the per-block offset pattern
    is static, so each block is an unrolled sequence of fixed-length
    lax.scan segments inside one outer scan over blocks. Returns
    (coords [B*n_off, V, 3], velocs [B*n_off, V, 3], steps [B*n_off]).
    """
    config = config or LangevinConfig()
    step = langevin_step_fn(system, config)
    offsets = log_spaced_offsets(report_interval, factor)
    seg_lengths = [offsets[0]] + [b - a for a, b in zip(offsets, offsets[1:])]

    def run_n(carry, key, n):
        def body(c, k):
            cc, vv = c
            return step(cc, vv, k), None

        carry, _ = jax.lax.scan(body, carry, jax.random.split(key, n))
        return carry

    def block(carry, key):
        keys = jax.random.split(key, len(seg_lengths))
        frames = []
        for i, n in enumerate(seg_lengths):
            carry = run_n(carry, keys[i], n)
            frames.append(carry)
        return carry, (
            jnp.stack([f[0] for f in frames]),
            jnp.stack([f[1] for f in frames]),
        )

    keys = jax.random.split(key, num_blocks)
    _, (tc, tv) = jax.lax.scan(block, (coords, velocs), keys)
    steps = (
        np.arange(num_blocks, dtype=np.int64)[:, None] * report_interval
        + np.asarray(offsets, dtype=np.int64)[None, :]
    ).reshape(-1)
    V = coords.shape[-2]
    return tc.reshape(-1, V, 3), tv.reshape(-1, V, 3), steps


def maxwell_boltzmann_velocities(
    system: AmberSystem, key: jax.Array, temperature: float = DEFAULT_TEMPERATURE
) -> jnp.ndarray:
    sigma = jnp.sqrt(kbT(temperature) / system.masses)[:, None]
    return sigma * jax.random.normal(key, (system.num_atoms, 3))
