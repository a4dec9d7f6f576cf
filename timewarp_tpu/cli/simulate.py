"""MD trajectory generation CLI (the reference's simulate_trajectory.py,
reference: simulation/simulate_trajectory.py:66-258, rebuilt on the JAX
Langevin engine with vmapped walkers).

Usage:
  python -m timewarp_tpu.cli.simulate <input.pdb> <output-prefix> \
      [--frames N] [--spacing S] [--burn-in B] [--walkers W] [--log-spacing]

Writes `{prefix}-traj-state0.pdb` (copy of the topology source) and
`{prefix}-traj-arrays.npz` with step/time/positions/velocities/forces/
energies -- the same schema the data layer ingests
(reference: simulation/npzreporter.py:17-293).
"""
import argparse
import shutil
import time

import numpy as np


def logarithmic_steps(spacing: int, count: int, factor: int = 10):
    """Step indices with the reference's logarithmic spacing pattern: within
    each decade of length spacing*factor, record every `spacing` steps
    (reference: simulation/npzreporter.py:44-87)."""
    steps = []
    s = spacing
    t = 0
    while len(steps) < count:
        t += s
        steps.append(t)
        if len(steps) % (factor - 1) == 0:
            s *= factor
    return np.array(steps[:count], dtype=np.int64)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input_pdb")
    ap.add_argument("output_prefix")
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--spacing", type=int, default=1000, help="steps between frames")
    ap.add_argument("--burn-in", type=int, default=100_000)
    ap.add_argument("--walkers", type=int, default=1)
    ap.add_argument("--temperature", type=float, default=310.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.constants import DEFAULT_TIMESTEP
    from timewarp_tpu.physics.energy import batched_potential_energy, potential_energy
    from timewarp_tpu.physics.integrator import (
        LangevinConfig,
        maxwell_boltzmann_velocities,
        run_segment,
        sample_trajectory,
    )

    topo = parse_pdb(args.input_pdb)
    system, report = build_system(topo)
    print(
        f"{topo.num_atoms} atoms, total charge {report.total_charge:+.3f}"
        + (f", fallback terminals: {report.fallback_terminals}" if report.fallback_terminals else "")
    )
    cfg = LangevinConfig(temperature=args.temperature)

    W = args.walkers
    frames_per_walker = -(-args.frames // W)
    keys = jax.random.split(jax.random.PRNGKey(args.seed), W)
    coords0 = jnp.tile(jnp.asarray(topo.positions)[None], (W, 1, 1))
    velocs0 = jax.vmap(
        lambda k: maxwell_boltzmann_velocities(system, k, args.temperature)
    )(keys)

    t0 = time.time()
    burn = jax.jit(
        jax.vmap(lambda c, v, k: run_segment(system, c, v, k, args.burn_in, cfg))
    )
    coords, velocs = burn(
        coords0, velocs0, jax.random.split(jax.random.PRNGKey(args.seed + 1), W)
    )
    traj = jax.jit(
        jax.vmap(
            lambda c, v, k: sample_trajectory(
                system, c, v, k, frames_per_walker, args.spacing, cfg
            )
        )
    )
    tc, tv = traj(coords, velocs, jax.random.split(jax.random.PRNGKey(args.seed + 2), W))
    tc = np.asarray(tc).reshape(-1, topo.num_atoms, 3)[: args.frames]
    tv = np.asarray(tv).reshape(-1, topo.num_atoms, 3)[: args.frames]
    assert np.isfinite(tc).all(), "trajectory diverged"
    total = W * (args.burn_in + frames_per_walker * args.spacing)
    print(f"{total} MD steps in {time.time()-t0:.1f}s ({total/(time.time()-t0):.0f} steps/s)")

    # Energies/forces for the recorded frames.
    e_pot = np.asarray(batched_potential_energy(system, jnp.asarray(tc)))
    masses = np.asarray(system.masses)
    e_kin = 0.5 * (masses[None, :, None] * tv**2).sum((1, 2))
    grad = jax.jit(jax.vmap(jax.grad(lambda c: potential_energy(system, c))))
    forces = -np.asarray(grad(jnp.asarray(tc)))

    steps = (np.arange(len(tc)) + 1) * args.spacing
    np.savez_compressed(
        f"{args.output_prefix}-traj-arrays.npz",
        step=steps,
        time=steps * DEFAULT_TIMESTEP,
        positions=tc.astype(np.float32),
        velocities=tv.astype(np.float32),
        forces=forces.astype(np.float32),
        energies=np.stack([e_pot, e_kin], axis=1),
    )
    shutil.copy(args.input_pdb, f"{args.output_prefix}-traj-state0.pdb")
    print(f"wrote {args.output_prefix}-traj-arrays.npz ({len(tc)} frames)")


if __name__ == "__main__":
    main()
