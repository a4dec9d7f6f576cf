"""Backbone/side-chain torsion extraction without mdtraj.

Reference: utils/torsion_utils.py:22-162 delegates to mdtraj; here the
phi/psi (and chi1) quadruples are located directly from the parsed topology
and evaluated with the same dihedral kernel the physics module uses.
"""
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import Topology
from timewarp_tpu.physics.energy import dihedral_angle


def _atom(topology: Topology, res_idx: int, name: str) -> Optional[int]:
    return topology.atom_index(topology.residues[res_idx], name)


def phi_psi_indices(topology: Topology) -> Tuple[np.ndarray, np.ndarray]:
    """phi = C(i-1)-N(i)-CA(i)-C(i); psi = N(i)-CA(i)-C(i)-N(i+1)."""
    phis: List[Tuple[int, int, int, int]] = []
    psis: List[Tuple[int, int, int, int]] = []
    res = topology.residues
    for i in range(len(res)):
        n = _atom(topology, i, "N")
        ca = _atom(topology, i, "CA")
        c = _atom(topology, i, "C")
        if None in (n, ca, c):
            continue
        if i > 0:
            c_prev = _atom(topology, i - 1, "C")
            if c_prev is not None:
                phis.append((c_prev, n, ca, c))
        if i + 1 < len(res):
            n_next = _atom(topology, i + 1, "N")
            if n_next is not None:
                psis.append((n, ca, c, n_next))
    return (
        np.array(phis, dtype=np.int32).reshape(-1, 4),
        np.array(psis, dtype=np.int32).reshape(-1, 4),
    )


def compute_torsions(coords: jnp.ndarray, quadruples: np.ndarray) -> jnp.ndarray:
    """coords [..., V, 3], quadruples [Q, 4] -> angles [..., Q] in radians,
    IUPAC sign convention.

    The physics kernel's dihedral is the IUPAC angle NEGATED (its b0 vector
    points p0->p1 where the IUPAC formula uses p1->p0); the energy only uses
    cos(n*phi - {0, pi}) which is parity-even, so the physics is unaffected,
    but analysis angles must be flipped or every Ramachandran plot mirrors
    the literature (caught round 2: L-peptides read phi ~ +90).
    """
    p = coords[..., quadruples, :]  # [..., Q, 4, 3]
    return -dihedral_angle(
        p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    )


def ramachandran(coords: jnp.ndarray, topology: Topology):
    """(phi [..., P], psi [..., P]) in radians for a batch of conformations."""
    phi_idx, psi_idx = phi_psi_indices(topology)
    return compute_torsions(coords, phi_idx), compute_torsions(coords, psi_idx)


def ramachandran_kl(
    phi_a, psi_a, phi_b, psi_b, bins: int = 36, eps: float = 1e-8
) -> float:
    """Symmetrized KL divergence between two 2-D Ramachandran histograms
    (the parity metric of BASELINE.json)."""
    edges = np.linspace(-np.pi, np.pi, bins + 1)

    def hist(phi, psi):
        h, _, _ = np.histogram2d(
            np.asarray(phi).ravel(), np.asarray(psi).ravel(), bins=(edges, edges)
        )
        h = h + eps
        return h / h.sum()

    pa = hist(phi_a, psi_a)
    pb = hist(phi_b, psi_b)
    kl_ab = (pa * np.log(pa / pb)).sum()
    kl_ba = (pb * np.log(pb / pa)).sum()
    return float(0.5 * (kl_ab + kl_ba))
