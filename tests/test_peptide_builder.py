"""Peptide builder: construction, parameterization, minimization sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.peptide_builder import (
    available_residues,
    build_peptide,
    harvest_templates,
    random_sequence,
)
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.energy import potential_energy
from timewarp_tpu.physics.minimize import minimize


@pytest.fixture(scope="module")
def templates():
    return harvest_templates()


def test_templates_cover_most_residues(templates):
    assert len(templates) >= 15
    assert {"ALA", "GLY", "ASN", "GLN", "LYS", "ASP"} <= set(templates)


@pytest.mark.parametrize("seq,charge", [("AG", 0.0), ("KAVL", 1.0), ("DG", -1.0)])
def test_build_and_parameterize(templates, seq, charge):
    topo = build_peptide(seq, templates)
    system, report = build_system(topo)
    assert abs(report.total_charge - charge) < 1e-6
    # Every atom bonded; hydrogens once.
    counts = np.zeros(topo.num_atoms, int)
    for i, j in topo.bonds:
        counts[i] += 1
        counts[j] += 1
    assert (counts > 0).all()


@pytest.mark.slow
def test_built_peptide_minimizes_to_sane_energy(templates):
    topo = build_peptide("AG", templates)
    system, _ = build_system(topo)
    coords = jnp.asarray(topo.positions)
    x, e = jax.jit(lambda c: minimize(system, c, num_steps=800))(coords)
    assert np.isfinite(float(e))
    assert float(e) < float(potential_energy(system, coords))
    # No bond explosion: all bonds within 2x their rest length.
    lengths = np.linalg.norm(
        np.asarray(x)[topo.bonds[:, 0]] - np.asarray(x)[topo.bonds[:, 1]], axis=-1
    )
    np.testing.assert_array_less(lengths, 2 * np.asarray(system.bond_r0))


def test_random_sequence_distribution():
    rng = np.random.default_rng(0)
    seqs = [random_sequence(4, rng) for _ in range(50)]
    assert all(len(s) == 4 for s in seqs)
    assert all(s[0] != "P" for s in seqs)
    assert len(set(seqs)) > 30  # diversity


def test_nterm_proline_rejected(templates):
    with pytest.raises(ValueError):
        build_peptide("PG", templates)


def test_all_twenty_amino_acids_available(templates):
    """The reference generates all 20 AAs via tleap (reference:
    simulation/create_random_peptides.py); the template harvest must too."""
    from timewarp_tpu.data.peptide_builder import AA_CODES

    assert set(templates) >= set(AA_CODES.values())


@pytest.mark.slow
def test_cys_his_met_parameterize_and_minimize(templates):
    """The residues supplied by the AF fixtures (CYS/HIS/MET) build,
    parameterize (HID tautomer dispatch), and minimize to finite energy."""
    topo = build_peptide("CHMA", templates)
    system, report = build_system(topo)
    assert abs(report.total_charge) < 1e-6
    assert not report.missing_dihedrals
    coords = jnp.asarray(topo.positions)
    x, e = jax.jit(lambda c: minimize(system, c, num_steps=800))(coords)
    assert np.isfinite(float(e))
    lengths = np.linalg.norm(
        np.asarray(x)[topo.bonds[:, 0]] - np.asarray(x)[topo.bonds[:, 1]], axis=-1
    )
    np.testing.assert_array_less(lengths, 2 * np.asarray(system.bond_r0))
