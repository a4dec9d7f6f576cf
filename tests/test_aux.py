"""Aux subsystems: exploration, moments, data QA, diatomic harness,
chirality, torsions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.physics.diatomic import (
    analytic_bond_length_density,
    bond_lengths,
    make_o2_system,
)
from timewarp_tpu.utils.chirality import (
    check_symmetry_change,
    chirality_signs,
    find_chirality_centers,
)
from timewarp_tpu.utils.datacheck import check_trajectory_npz, split_r_hat
from timewarp_tpu.utils.moments import Moments


def test_moments_matches_numpy(rng):
    x = rng.normal(size=500)
    m = Moments()
    m.update(x[:200])
    m.update(x[200:])
    assert abs(m.mean - x.mean()) < 1e-9
    assert abs(m.variance - x.var()) < 1e-9


def test_split_r_hat_detects_drift(rng):
    stationary = rng.normal(size=4000)
    drifting = rng.normal(size=4000) + np.linspace(0, 10, 4000)
    assert split_r_hat(stationary) < 1.1
    assert split_r_hat(drifting) > 1.5


def test_check_trajectory_npz(rng):
    good = {
        "positions": rng.normal(size=(50, 5, 3)).astype(np.float32),
        "energies": np.stack([rng.normal(size=50), rng.normal(size=50)], axis=1),
    }
    assert check_trajectory_npz(good).ok
    bad = dict(good)
    bad["positions"] = good["positions"].copy()
    bad["positions"][0, 0, 0] = np.nan
    report = check_trajectory_npz(bad)
    assert not report.ok and "non-finite" in str(report)


def test_chirality_sign_flips_on_mirror(rng):
    """Mirroring coordinates flips every chirality sign
    (reference: tests/test_chirality.py:24-56)."""
    # A center with 4 neighbours.
    adj = np.array([[0, 1], [0, 2], [0, 3], [0, 4]])
    centers = find_chirality_centers(adj, 5)
    assert centers.shape == (1, 4)
    coords = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    signs = chirality_signs(coords, centers)
    mirrored = coords * jnp.asarray([-1.0, 1.0, 1.0])
    signs_m = chirality_signs(mirrored, centers)
    assert np.all(np.asarray(signs) == -np.asarray(signs_m))
    assert bool(check_symmetry_change(mirrored, centers, signs))
    assert not bool(check_symmetry_change(coords, centers, signs))


def test_o2_langevin_matches_analytic_density():
    """Langevin samples of the harmonic O2 reproduce the analytic
    bond-length density (the reference's O2 sanity harness,
    evaluate_o2.py)."""
    from timewarp_tpu.physics.integrator import (
        maxwell_boltzmann_velocities,
        sample_trajectory,
    )

    system = make_o2_system()
    coords0 = jnp.asarray([[0.0, 0.0, 0.0], [0.121, 0.0, 0.0]])
    velocs0 = maxwell_boltzmann_velocities(system, jax.random.PRNGKey(0))
    tc, _ = jax.jit(
        lambda c, v, k: sample_trajectory(
            system, c, v, k, num_frames=3000, steps_per_frame=20
        )
    )(coords0, velocs0, jax.random.PRNGKey(1))
    r = bond_lengths(np.asarray(tc))
    grid = np.linspace(r.min() - 1e-3, r.max() + 1e-3, 200)
    p = analytic_bond_length_density(grid)
    mean_analytic = np.trapezoid(grid * p, grid)
    std_analytic = np.sqrt(np.trapezoid((grid - mean_analytic) ** 2 * p, grid))
    assert abs(r.mean() - mean_analytic) < 0.2 * std_analytic
    assert 0.7 < r.std() / std_analytic < 1.4


def test_exploration_runs_and_respects_threshold(rng):
    from timewarp_tpu.sampling.exploration import ExplorationConfig, explore

    W, V = 4, 3

    def energy_fn(coords):
        return 0.5 * (coords**2).sum((-1, -2))

    def propose_batch_fn(params, key, coords, velocs):
        # Random-walk proposals; occasionally large.
        step = 0.5 * jax.random.normal(key, coords.shape)
        return coords + step, velocs

    coords0 = jnp.asarray(rng.normal(size=(W, V, 3)).astype(np.float32))
    final, out = explore(
        None, coords0, jax.random.PRNGKey(0), propose_batch_fn, energy_fn,
        num_steps=50, config=ExplorationConfig(energy_threshold=1.0),
    )
    assert final.shape == (W, V, 3)
    # Accepted steps never exceed the threshold.
    e = np.asarray(out.e_pot)
    acc = np.asarray(out.accepted)
    prev = np.concatenate([np.asarray(energy_fn(coords0))[None], e[:-1]], axis=0)
    jumps = (e - prev)[acc]
    assert np.all(jumps < 1.0 + 1e-5)


def test_chirality_centers_reference_semantics():
    """Center selection matches the reference exactly on real fixtures
    (reference: utils/chirality.py:14-37): degree exactly 4, centers bonded
    to >= 2 hydrogens excluded (their mirror is an H permutation), and
    neighbours in bond-list order. Expectations computed with the reference
    algorithm on the same topologies."""
    from timewarp_tpu.data.pdb import parse_pdb

    topo = parse_pdb("/root/reference/testdata/output/2olx-traj-state0.pdb")
    centers = find_chirality_centers(
        topo.bonds, topo.num_atoms, atom_types=topo.atom_types
    )
    np.testing.assert_array_equal(
        centers,
        [[4, 0, 5, 6], [18, 16, 19, 20], [32, 30, 33, 34], [49, 47, 50, 51]],
    )

    ad = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    centers_ad = find_chirality_centers(ad.bonds, ad.num_atoms, atom_types=ad.atom_types)
    np.testing.assert_array_equal(centers_ad, [[8, 6, 9, 10]])

    # A true mirror flips every center; H-permutation-only centers (e.g. the
    # 2olx methyl carbons with 3 hydrogens) are never in the list, so no
    # spurious penalty can fire on physically irrelevant flips.
    coords = jnp.asarray(topo.positions)
    signs = chirality_signs(coords, centers)
    mirrored = coords * jnp.asarray([-1.0, 1.0, 1.0])
    assert bool(check_symmetry_change(mirrored, centers, signs))
    assert not bool(check_symmetry_change(coords, centers, signs))
