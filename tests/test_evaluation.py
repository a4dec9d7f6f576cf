"""Evaluation diagnostics: sample_on_batches shapes/finiteness, conditional
model-vs-MD comparison, energy overlap metric."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.sampling.evaluation import (
    energy_histogram_overlap,
    kinetic_energy_ks,
    sample_on_batches,
    sample_vs_md_conditional,
)
from timewarp_tpu.sampling.mh import make_amber_energy

from tests.test_training import make_batch, tiny_model

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def test_energy_histogram_overlap_bounds(rng):
    a = rng.normal(size=2000)
    assert energy_histogram_overlap(a, a) > 0.9
    # Median-centering (opt-in, for cross-potential comparisons) deliberately
    # ignores constant offsets -- the convention-level offset vs OpenMM
    # (tests/test_physics.py:62-68); shape differences still register. The
    # uncentered default treats a mean shift as a real distribution mismatch.
    assert energy_histogram_overlap(a, a + 100, center=True) > 0.9
    assert energy_histogram_overlap(a, a + 100) < 0.05
    assert energy_histogram_overlap(a, 3.0 * a) < 0.6


def test_kinetic_ks_on_maxwell_boltzmann(rng):
    """MB velocities must pass the chi2(3V) test; scaled ones must fail."""
    from timewarp_tpu.physics.integrator import maxwell_boltzmann_velocities

    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    v = np.stack(
        [
            np.asarray(maxwell_boltzmann_velocities(system, jax.random.PRNGKey(i)))
            for i in range(300)
        ]
    )
    m = np.asarray(system.masses)
    ks_good = kinetic_energy_ks(v, m, float(kbT()))
    ks_bad = kinetic_energy_ks(1.5 * v, m, float(kbT()))
    assert ks_good < 0.08
    assert ks_bad > 0.5


def test_sample_on_batches_shapes(rng):
    model = tiny_model()
    batch = make_batch(rng, B=4, V=8)
    params = model.init(
        jax.random.PRNGKey(0), batch.atom_types, batch.atom_coords,
        batch.atom_velocs, batch.atom_coord_targets, batch.atom_veloc_targets,
        batch.masked_elements,
    )

    def energy_fn(coords):
        return 0.5 * (coords**2).sum((-1, -2))

    diag = sample_on_batches(
        model, params, batch, energy_fn, jnp.ones((8,)), 1.0,
        jax.random.PRNGKey(1),
    )
    assert diag.y_coords_model.shape == (4, 8, 3)
    assert diag.acceptance.shape == (4,)
    assert np.isfinite(diag.p_xy).all() and np.isfinite(diag.p_yx_training).all()
    assert 0.0 <= diag.mean_acceptance <= 1.0


def test_sample_vs_md_conditional_runs():
    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    V = topo.num_atoms
    model = tiny_model()
    atom_types = jnp.asarray(topo.atom_types)[None]
    x = jnp.asarray(topo.positions)
    params = model.init(
        jax.random.PRNGKey(0), atom_types, x[None], jnp.zeros((1, V, 3)),
        x[None], jnp.zeros((1, V, 3)), jnp.zeros((1, V), bool),
    )
    mc, md = sample_vs_md_conditional(
        model, params, system, x, atom_types, num_samples=3, step_width=20,
        rng=jax.random.PRNGKey(2),
    )
    assert mc.shape == (3, V, 3) and md.shape == (3, V, 3)
    assert np.isfinite(md).all()
    # MD segments stay near the conditioning state over 10 fs.
    assert np.abs(md - np.asarray(x)).max() < 0.5
