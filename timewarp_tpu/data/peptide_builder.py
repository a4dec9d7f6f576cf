"""Peptide construction from sequence strings.

The reference builds random 2AA/4AA peptides with tleap extended structures
(reference: simulation/create_random_peptides.py, create_linear_protein.py).
tleap is not in the image, so peptides are assembled from *geometry
templates*: per-residue all-atom coordinates harvested from the reference's
real PDB fixtures, rigid-aligned onto an ideal extended backbone built with
NeRF internal-coordinate placement, with charged termini grafted the same
way. The result is cleaned up with FIRE minimization on the JAX energy
before use.
"""
import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from timewarp_tpu.data.pdb import Atom, Residue, Topology, _derive_bonds
from timewarp_tpu.data.residues import RESIDUE_BONDS

TEMPLATE_PDBS = [
    "/root/reference/testdata/output/1hgv-traj-state0.pdb",
    "/root/reference/testdata/output/2olx-traj-state0.pdb",
    # AlphaFold-derived hydrogenated fixtures: supply the residues absent
    # from 1hgv/2olx (CYS free-thiol, HIS as the HID tautomer, mid-chain
    # MET), completing all 20 amino acids (the reference generates all 20
    # via tleap, reference: simulation/create_random_peptides.py).
    "/root/reference/testdata/AF-O97980-F1-model_v1-traj-state0.pdb",
    "/root/reference/testdata/AF-P0C6P0-F1-model_v1-traj-state0.pdb",
]

AA_CODES = {
    "A": "ALA", "R": "ARG", "N": "ASN", "D": "ASP", "C": "CYS",
    "Q": "GLN", "E": "GLU", "G": "GLY", "H": "HIS", "I": "ILE",
    "L": "LEU", "K": "LYS", "M": "MET", "F": "PHE", "P": "PRO",
    "S": "SER", "T": "THR", "W": "TRP", "Y": "TYR", "V": "VAL",
}

# Empirical amino-acid frequencies (vertebrate proteome, normalized over the
# residues available as templates at runtime).
AA_FREQUENCIES = {
    "A": 0.074, "R": 0.042, "N": 0.044, "D": 0.059, "C": 0.033,
    "Q": 0.037, "E": 0.058, "G": 0.074, "H": 0.029, "I": 0.038,
    "L": 0.076, "K": 0.072, "M": 0.018, "F": 0.040, "P": 0.050,
    "S": 0.081, "T": 0.062, "W": 0.013, "Y": 0.033, "V": 0.068,
}

# Ideal backbone internal coordinates (nm / degrees).
BB_N_CA, BB_CA_C, BB_C_N = 0.1458, 0.1523, 0.1329
ANG_C_N_CA, ANG_N_CA_C, ANG_CA_C_N = 121.7, 110.4, 116.6
OMEGA = 180.0
PHI_EXT, PSI_EXT = -135.0, 135.0


def _place(a, b, c, bond: float, angle_deg: float, torsion_deg: float) -> np.ndarray:
    """NeRF: position d given three placed atoms and internal coordinates."""
    angle = np.radians(angle_deg)
    torsion = np.radians(torsion_deg)
    bc = c - b
    bc /= np.linalg.norm(bc)
    n = np.cross(b - a, bc)
    n /= np.linalg.norm(n) + 1e-12
    m = np.cross(n, bc)
    d_local = np.array(
        [
            -bond * np.cos(angle),
            bond * np.sin(angle) * np.cos(torsion),
            bond * np.sin(angle) * np.sin(torsion),
        ]
    )
    return c + d_local[0] * bc + d_local[1] * m + d_local[2] * n


def _rigid_from_three_points(src: np.ndarray, dst: np.ndarray):
    """Rigid transform mapping the src (3,3) triad onto dst (3,3) (Kabsch)."""
    sc, dc = src.mean(axis=0), dst.mean(axis=0)
    h = (src - sc).T @ (dst - dc)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    R = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    return R, dc - R @ sc


@dataclasses.dataclass
class ResidueTemplate:
    name: str
    atom_names: List[str]
    elements: List[str]
    coords: np.ndarray  # [n, 3]
    backbone_idx: Tuple[int, int, int]  # indices of N, CA, C


def harvest_templates(pdb_paths: Sequence[str] = tuple(TEMPLATE_PDBS)) -> Dict[str, ResidueTemplate]:
    """Extract one mid-chain geometry template per residue type (plus the
    special N-terminal proton and C-terminal OXT geometries)."""
    from timewarp_tpu.data.pdb import parse_pdb

    templates: Dict[str, ResidueTemplate] = {}
    terminal_candidates: Dict[str, ResidueTemplate] = {}
    for path in pdb_paths:
        topo = parse_pdb(path)
        for res in topo.residues:
            is_first = res.index == 0
            is_last = res.index == len(topo.residues) - 1
            names = [topo.atoms[i].name for i in res.atom_indices]
            if res.name in templates or res.name not in RESIDUE_BONDS:
                continue
            if is_first or is_last or "OXT" in names:
                # Terminal instance: usable as a fallback mid-chain template
                # once the terminal-only atoms (NH3+ extra protons, OXT) are
                # stripped; the side-chain geometry is unaffected and FIRE
                # minimization cleans up the backbone afterwards.
                if res.name not in terminal_candidates:
                    keep = [
                        (k, n) for k, n in zip(res.atom_indices, names)
                        if n not in ("H2", "H3", "OXT")
                    ]
                    knames = [("H" if n == "H1" else n) for _, n in keep]
                    kidx = [k for k, _ in keep]
                    try:
                        bb = (knames.index("N"), knames.index("CA"), knames.index("C"))
                    except ValueError:
                        continue
                    terminal_candidates[res.name] = ResidueTemplate(
                        name=res.name,
                        atom_names=knames,
                        elements=[topo.atoms[k].element for k in kidx],
                        coords=topo.positions[kidx],
                        backbone_idx=bb,
                    )
                continue
            try:
                bb = (names.index("N"), names.index("CA"), names.index("C"))
            except ValueError:
                continue
            templates[res.name] = ResidueTemplate(
                name=res.name,
                atom_names=names,
                elements=[topo.atoms[i].element for i in res.atom_indices],
                coords=topo.positions[res.atom_indices],
                backbone_idx=bb,
            )
    for name, t in terminal_candidates.items():
        templates.setdefault(name, t)
    return templates


def available_residues() -> List[str]:
    return sorted(harvest_templates().keys())


def build_peptide(
    sequence: str,
    templates: Optional[Dict[str, ResidueTemplate]] = None,
    phi: float = PHI_EXT,
    psi: float = PSI_EXT,
) -> Topology:
    """Build an extended zwitterionic peptide from a one-letter sequence.

    Returns a Topology (atoms/residues/bonds + constructed positions in nm).
    Run physics.minimize.minimize() on the built structure before dynamics.
    """
    templates = templates or harvest_templates()
    if sequence[0] == "P":
        # Protonated N-terminal proline needs ring-aware NH2+ geometry;
        # not supported by the template-grafting builder.
        raise ValueError("N-terminal proline is not supported by the builder")
    resnames = [AA_CODES[c] for c in sequence]
    missing = [r for r in resnames if r not in templates]
    if missing:
        raise ValueError(f"no geometry template for {sorted(set(missing))}; "
                         f"available: {sorted(templates)}")

    # 1. Ideal extended backbone via NeRF.
    n_res = len(resnames)
    bb = np.zeros((n_res, 3, 3))  # N, CA, C per residue
    bb[0, 0] = [0.0, 0.0, 0.0]
    bb[0, 1] = [BB_N_CA, 0.0, 0.0]
    bb[0, 2] = _place(
        np.array([0.0, 0.1, 0.0]), bb[0, 0], bb[0, 1], BB_CA_C, ANG_N_CA_C, psi
    )
    for i in range(1, n_res):
        n_i = _place(bb[i - 1, 0], bb[i - 1, 1], bb[i - 1, 2], BB_C_N, ANG_CA_C_N, psi)
        ca_i = _place(bb[i - 1, 1], bb[i - 1, 2], n_i, BB_N_CA, ANG_C_N_CA, OMEGA)
        c_i = _place(bb[i - 1, 2], n_i, ca_i, BB_CA_C, ANG_N_CA_C, phi)
        bb[i] = [n_i, ca_i, c_i]

    # 2. Graft residue templates onto the backbone triads.
    atoms: List[Atom] = []
    residues: List[Residue] = []
    positions: List[np.ndarray] = []
    for i, rn in enumerate(resnames):
        t = templates[rn]
        src = t.coords[list(t.backbone_idx)]
        R, shift = _rigid_from_three_points(src, bb[i])
        placed = t.coords @ R.T + shift
        res = Residue(index=i, name=rn, chain_id="A", resseq=i + 1, atom_indices=[])
        keep = list(range(len(t.atom_names)))
        if i == 0:
            # Replace the amide H with an NH3+ triad around N.
            keep = [k for k in keep if t.atom_names[k] != "H"]
        for k in keep:
            atom = Atom(
                index=len(atoms),
                name=t.atom_names[k],
                element=t.elements[k],
                residue_index=i,
            )
            res.atom_indices.append(atom.index)
            atoms.append(atom)
            positions.append(placed[k])
        if i == 0:
            # NH3+ hydrogens by NeRF around the N (staggered).
            n_pos, ca_pos, c_pos = bb[0]
            for j, name in enumerate(("H1", "H2", "H3")):
                h = _place(c_pos, ca_pos, n_pos, 0.101, 109.5, 60.0 + 120.0 * j)
                atom = Atom(
                    index=len(atoms), name=name, element="H", residue_index=0
                )
                res.atom_indices.append(atom.index)
                atoms.append(atom)
                positions.append(h)
        if i == n_res - 1:
            # OXT completing the carboxylate, anti to O.
            names_here = [atoms[k].name for k in res.atom_indices]
            o_idx = res.atom_indices[names_here.index("O")]
            oxt = _place(positions[o_idx], bb[i, 1], bb[i, 2], 0.125, 117.0, 180.0)
            atom = Atom(index=len(atoms), name="OXT", element="O", residue_index=i)
            res.atom_indices.append(atom.index)
            atoms.append(atom)
            positions.append(oxt)
        residues.append(res)

    pos = np.asarray(positions, dtype=np.float32)
    bonds = _derive_bonds(atoms, residues, pos)
    return Topology(atoms=atoms, residues=residues, bonds=bonds, positions=pos)


def random_sequence(length: int, rng: np.random.Generator, available: Optional[Sequence[str]] = None) -> str:
    """Random sequence using empirical AA frequencies, restricted to residues
    with templates (reference: simulation/create_random_peptides.py)."""
    if available is None:
        avail_res = set(available_residues())
        available = [c for c, rn in AA_CODES.items() if rn in avail_res]
    probs = np.array([AA_FREQUENCIES[c] for c in available])
    probs /= probs.sum()
    seq = "".join(rng.choice(list(available), size=length, p=probs))
    while seq[0] == "P":  # N-terminal proline unsupported (see build_peptide)
        seq = rng.choice([c for c in available if c != "P"]) + seq[1:]
    return seq
