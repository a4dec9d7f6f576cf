"""Langevin integrator sanity: stability and thermal equilibration on
alanine dipeptide."""
import jax
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.physics.energy import potential_energy
from timewarp_tpu.physics.integrator import (
    LangevinConfig,
    maxwell_boltzmann_velocities,
    run_segment,
)

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def test_langevin_stable_and_thermalizes():
    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    coords = jnp.asarray(topo.positions)
    key = jax.random.PRNGKey(0)
    velocs = maxwell_boltzmann_velocities(system, key)

    e0 = float(potential_energy(system, coords))
    run = jax.jit(lambda c, v, k: run_segment(system, c, v, k, num_steps=500))
    coords1, velocs1 = run(coords, velocs, jax.random.PRNGKey(1))
    e1 = float(potential_energy(system, coords1))
    assert np.isfinite(e1)
    # Molecule stays intact: no atom moved more than 1 nm in 0.25 ps.
    assert float(jnp.abs(coords1 - coords).max()) < 1.0

    # Kinetic energy near equipartition: 3/2 N kT within 40% after a few
    # hundred steps (small system, large fluctuations).
    m = np.asarray(system.masses)
    ke = 0.5 * float((m[:, None] * np.asarray(velocs1) ** 2).sum())
    target = 1.5 * system.num_atoms * kbT()
    assert 0.4 * target < ke < 1.9 * target, (ke, target)
