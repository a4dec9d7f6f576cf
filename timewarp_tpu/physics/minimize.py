"""Energy minimization (the reference delegates to OpenMM's
LocalEnergyMinimizer, simulation/simulate_trajectory.py:190).

FIRE (fast inertial relaxation engine) in a lax.scan: robust for cleaning up
constructed/spliced structures before dynamics.
"""
from typing import Tuple

import jax
import jax.numpy as jnp

from timewarp_tpu.physics.energy import potential_energy
from timewarp_tpu.physics.system import AmberSystem


def minimize(
    system: AmberSystem,
    coords: jnp.ndarray,
    num_steps: int = 2000,
    dt_start: float = 1e-4,
    dt_max: float = 2e-3,
    f_clip: float = 1e5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FIRE minimization; returns (coords, final_energy)."""
    grad_fn = jax.grad(lambda c: potential_energy(system, c))

    def step(carry, _):
        x, v, dt, alpha = carry
        f = -grad_fn(x)
        f = jnp.clip(f, -f_clip, f_clip)
        power = (f * v).sum()
        f_norm = jnp.sqrt((f * f).sum()) + 1e-12
        v_norm = jnp.sqrt((v * v).sum())
        v_mixed = (1 - alpha) * v + alpha * f / f_norm * v_norm

        uphill = power <= 0
        v_new = jnp.where(uphill, jnp.zeros_like(v), v_mixed)
        dt_new = jnp.where(uphill, dt * 0.5, jnp.minimum(dt * 1.1, dt_max))
        alpha_new = jnp.where(uphill, 0.1, alpha * 0.99)

        v_new = v_new + dt_new * f
        x_new = x + dt_new * v_new
        return (x_new, v_new, dt_new, alpha_new), None

    init = (coords, jnp.zeros_like(coords), jnp.asarray(dt_start), jnp.asarray(0.1))
    (x, _, _, _), _ = jax.lax.scan(step, init, None, length=num_steps)
    return x, potential_energy(system, x)
