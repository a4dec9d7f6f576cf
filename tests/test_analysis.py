"""Analysis utilities: torsions, TICA, transitions, structure IO."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.utils.analysis import (
    bond_length_distributions,
    tica,
    torsion_transition_counts,
)
from timewarp_tpu.utils.structure_io import write_pdb, write_xyz
from timewarp_tpu.utils.torsions import phi_psi_indices, ramachandran, ramachandran_kl

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def test_phi_psi_indices_alanine():
    topo = parse_pdb(AD_PDB)
    phi, psi = phi_psi_indices(topo)
    # ACE-ALA-NME: one phi (C_ACE-N-CA-C) and one psi (N-CA-C-N_NME).
    assert phi.shape == (1, 4)
    assert psi.shape == (1, 4)
    names = [topo.atoms[i].name for i in phi[0]]
    assert names == ["C", "N", "CA", "C"]


def test_ramachandran_kl_identity(rng):
    phi = rng.uniform(-np.pi, np.pi, size=2000)
    psi = rng.uniform(-np.pi, np.pi, size=2000)
    kl_same = ramachandran_kl(phi, psi, phi, psi)
    assert kl_same == 0.0
    kl_diff = ramachandran_kl(phi, psi, phi * 0 + 1.0, psi * 0 - 1.0, bins=12)
    assert kl_diff > 1.0


def test_tica_finds_slow_mode(rng):
    # Slow sinusoid + fast noise: TIC-0 must align with the slow coordinate.
    t = np.arange(5000)
    slow = np.sin(2 * np.pi * t / 2000.0)
    fast = rng.normal(size=5000)
    X = np.stack([slow + 0.05 * rng.normal(size=5000), fast], axis=1)
    evals, proj = tica(X, lag=50, dim=2)
    assert evals[0] > 0.9  # slow mode autocorrelation ~1
    corr = np.corrcoef(proj[:, 0], slow)[0, 1]
    assert abs(corr) > 0.95


def test_transition_counts():
    # Alternating well occupancy with sharp jumps.
    a = np.concatenate([np.full(50, -2.0), np.full(50, 2.0), np.full(50, -2.0)])
    a += 0.01 * np.sin(np.arange(150))
    assert torsion_transition_counts(a, min_separation=10.0) == 2


def test_structure_io_roundtrip(tmp_path):
    topo = parse_pdb(AD_PDB)
    coords = np.stack([topo.positions, topo.positions + 0.01])
    pdb_path = str(tmp_path / "out.pdb")
    write_pdb(pdb_path, topo, coords)
    re_topo = parse_pdb(pdb_path)
    assert re_topo.num_atoms == topo.num_atoms
    np.testing.assert_allclose(re_topo.positions, topo.positions, atol=1e-3)
    write_xyz(str(tmp_path / "out.xyz"), topo, coords)
    assert os.path.getsize(tmp_path / "out.xyz") > 0


def test_bond_length_distributions():
    topo = parse_pdb(AD_PDB)
    coords = np.stack([topo.positions] * 3)
    d = bond_length_distributions(coords, topo.bonds)
    assert d.shape == (3, topo.bonds.shape[0])
    # Bonded atoms are 0.9-1.6 Angstrom apart.
    assert (d > 0.08).all() and (d < 0.17).all()


def test_atoms_viewer_html(tmp_path):
    """Self-contained HTML viewer embeds a valid, thinned trajectory
    (TPU-native stand-in for the reference's Jupyter atoms_viewer,
    reference: visualise/atoms_viewer/__init__.py)."""
    import json
    import re

    from timewarp_tpu.utils.atoms_viewer import write_viewer_html

    rng = np.random.default_rng(0)
    coords = rng.normal(size=(950, 5, 3)).astype(np.float32)
    bonds = np.array([[0, 1], [1, 2], [2, 3], [3, 4]])
    path = write_viewer_html(
        str(tmp_path / "v.html"), coords, ["C", "H", "N", "O", "S"], bonds
    )
    s = open(path).read()
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", s, re.S).group(1))
    assert len(data["frames"]) == 400  # thinned from 950
    assert len(data["frames"][0]) == 5
    assert data["bonds"] == bonds.tolist()
    # .format escaping left no stray template braces in the JS
    assert "{{" not in s and "}}" not in s


def test_phi_sign_convention_is_iupac():
    """L-peptides live at negative phi (alpha/beta regions); a mirrored sign
    convention would put the reference's own OpenMM trajectory at phi ~ +90
    (regression: round-2 found the physics dihedral is IUPAC-negated)."""
    import jax.numpy as jnp
    import numpy as np

    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.utils.torsions import ramachandran

    topo = parse_pdb("/root/reference/testdata/output/2olx-traj-state0.pdb")
    d = np.load("/root/reference/testdata/output/2olx-traj-arrays.npz")
    phi, _ = ramachandran(jnp.asarray(d["positions"][:50]), topo)
    assert (np.degrees(np.asarray(phi)) < 0).mean() > 0.95
