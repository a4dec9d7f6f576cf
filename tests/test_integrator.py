"""Langevin integrator sanity: stability and thermal equilibration on
alanine dipeptide."""
import jax
import pytest
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


@pytest.mark.slow
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


def test_log_spacing_roundtrip(tmp_path):
    """simulate --log-spacing produces the reference LogarithmicSpacing step
    pattern (simulation/npzreporter.py:44-87) and load_trajectory_pairs
    infers the spacing and pairs states without crossing blocks
    (reference: dataloader.py:236-248)."""
    from timewarp_tpu.cli.simulate import main as simulate_main
    from timewarp_tpu.data.trajectory import infer_spacing, load_trajectory_pairs
    from timewarp_tpu.physics.integrator import log_spaced_offsets

    assert log_spaced_offsets(10_000, 10) == (1, 10, 100, 1000, 10_000)
    assert log_spaced_offsets(500, 10) == (1, 10, 100, 500)

    prefix = str(tmp_path / "ad")
    simulate_main([
        AD_PDB, prefix, "--frames", "9", "--spacing", "100",
        "--burn-in", "10", "--log-spacing",
    ])
    data = np.load(prefix + "-traj-arrays.npz")
    steps = data["step"]
    # 3 offsets per block (1, 10, 100), 3 blocks.
    np.testing.assert_array_equal(
        steps, [1, 10, 100, 101, 110, 200, 201, 210, 300]
    )
    assert infer_spacing(steps) == 100

    traj = load_trajectory_pairs("ad", prefix + "-traj-state0.pdb",
                                 prefix + "-traj-arrays.npz", step_width=1)
    # step_width=1 pairs exist exactly at block boundaries: (100,101),(200,201).
    assert traj.num_pairs == 2
    i100 = int(np.nonzero(steps == 100)[0][0])
    np.testing.assert_allclose(
        np.sort(traj.coord_features.reshape(2, -1), axis=0),
        np.sort(np.asarray(data["positions"])[[i100, i100 + 3]].reshape(2, -1), axis=0),
    )


def test_simulate_walkers_write_separate_files(tmp_path):
    """--walkers W > 1 writes one NPZ per walker so step-index pairing can
    never create fake cross-walker transitions."""
    from timewarp_tpu.cli.simulate import main as simulate_main

    prefix = str(tmp_path / "ad")
    simulate_main([
        AD_PDB, prefix, "--frames", "4", "--spacing", "10",
        "--burn-in", "5", "--walkers", "2",
    ])
    import os
    for w in range(2):
        assert os.path.exists(f"{prefix}-w{w}-traj-arrays.npz")
        assert os.path.exists(f"{prefix}-w{w}-traj-state0.pdb")
        d = np.load(f"{prefix}-w{w}-traj-arrays.npz")
        assert d["positions"].shape[0] == 4
        np.testing.assert_array_equal(d["step"], [10, 20, 30, 40])
    assert not os.path.exists(prefix + "-traj-arrays.npz")


def test_com_motion_removed():
    """With remove_com_motion (default, matching OpenMM's CMMotionRemover,
    reference: md.py createSystem removeCMMotion default), the COM must stay
    put over thousands of steps; with it off, the COM diffuses."""
    from timewarp_tpu.physics.integrator import (
        LangevinConfig,
        langevin_step_fn,
        maxwell_boltzmann_velocities,
    )

    topo = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    system, _ = build_system(topo)
    m = jnp.asarray(system.masses)[:, None]

    def com(c):
        return np.asarray((m * c).sum(0) / m.sum())

    def run(remove, n=4000):
        step = langevin_step_fn(system, LangevinConfig(remove_com_motion=remove))

        def body(carry, k):
            return step(*carry, k), None

        c0 = jnp.asarray(topo.positions)
        v0 = maxwell_boltzmann_velocities(system, jax.random.PRNGKey(0))
        (c, v), _ = jax.lax.scan(
            body, (c0, v0), jax.random.split(jax.random.PRNGKey(1), n)
        )
        return np.linalg.norm(com(c) - com(c0))

    assert run(True) < 2e-3
    assert run(False) > 5e-3
