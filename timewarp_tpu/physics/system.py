"""Parameterized molecular system as a JAX pytree.

The TPU-native replacement for the reference's OpenMM ``System`` + context
(reference: utils/openmm/openmm_bridge.py:63-249): all force-field
parameters live in dense device arrays so the full potential is one fused
XLA program, differentiable with ``jax.grad`` (forces) and vmappable over
batches of conformations.

Nonbonded exclusions are encoded as dense [V, V] scale matrices (zero for
bonded 1-2/1-3 pairs, the AMBER 1-4 factors on dihedral-separated pairs,
one elsewhere) -- O(V^2) memory is trivial at peptide scale and keeps the
nonbonded inner loop a pure VPU/MXU computation with no gathers.
"""
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

# AMBER 1-4 scaling factors.
SCEE = 1.0 / 1.2  # electrostatic
SCNB = 0.5  # Lennard-Jones


@struct.dataclass
class AmberSystem:
    """All arrays are device-ready; integer index arrays are int32.

    Shapes: V atoms, Nb bonds, Na angles, Nt torsion terms (a 4-tuple with a
    3-term Fourier series appears as 3 entries).
    """

    masses: jnp.ndarray  # [V] dalton
    charges: jnp.ndarray  # [V] elementary charge

    bond_idx: jnp.ndarray  # [Nb, 2]
    bond_k: jnp.ndarray  # [Nb] kJ/mol/nm^2 (E = k/2 (r - r0)^2... see energy.py)
    bond_r0: jnp.ndarray  # [Nb] nm

    angle_idx: jnp.ndarray  # [Na, 3]
    angle_k: jnp.ndarray  # [Na] kJ/mol/rad^2
    angle_theta0: jnp.ndarray  # [Na] rad

    torsion_idx: jnp.ndarray  # [Nt, 4]
    torsion_k: jnp.ndarray  # [Nt] kJ/mol (barrier height)
    torsion_n: jnp.ndarray  # [Nt] periodicity
    torsion_phase: jnp.ndarray  # [Nt] rad

    lj_sigma: jnp.ndarray  # [V] nm
    lj_epsilon: jnp.ndarray  # [V] kJ/mol

    # Dense pairwise scale matrices (see module docstring).
    scale_coul: jnp.ndarray  # [V, V]
    scale_lj: jnp.ndarray  # [V, V]

    # GB-OBC parameters (zero-size arrays disable implicit solvent).
    gb_radii: jnp.ndarray  # [V] nm (intrinsic radii, before the 0.009 offset)
    gb_screen: jnp.ndarray  # [V]

    # Scalars (static so the energy jits specialize on them).
    cutoff: Optional[float] = struct.field(pytree_node=False, default=None)  # nm
    use_reaction_field: bool = struct.field(pytree_node=False, default=True)
    gb_model: Optional[str] = struct.field(pytree_node=False, default="obc2")
    solvent_dielectric: float = struct.field(pytree_node=False, default=78.5)
    solute_dielectric: float = struct.field(pytree_node=False, default=1.0)
    surface_tension: float = struct.field(
        pytree_node=False, default=28.3919551
    )  # kJ/mol/nm^2 (ACE SA term)

    @property
    def num_atoms(self) -> int:
        return self.masses.shape[0]


def build_scale_matrices(
    num_atoms: int, bonds: np.ndarray, torsion_14_pairs: np.ndarray
) -> tuple:
    """Dense nonbonded scale matrices from the bond graph.

    1-2 and 1-3 pairs are excluded; 1-4 pairs (separated by exactly three
    bonds along some path AND appearing as the outer atoms of a proper
    torsion) get the AMBER SCEE/SCNB factors; the diagonal is zero.
    """
    adj = [[] for _ in range(num_atoms)]
    for i, j in bonds:
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))

    coul = np.ones((num_atoms, num_atoms), dtype=np.float32)
    lj = np.ones((num_atoms, num_atoms), dtype=np.float32)
    np.fill_diagonal(coul, 0.0)
    np.fill_diagonal(lj, 0.0)

    def exclude(i, j):
        coul[i, j] = coul[j, i] = 0.0
        lj[i, j] = lj[j, i] = 0.0

    for i in range(num_atoms):
        for j in adj[i]:  # 1-2
            exclude(i, j)
            for k in adj[j]:  # 1-3
                if k != i:
                    exclude(i, k)

    # 1-4 scaling only where not already excluded by a shorter path (rings).
    for i, l in torsion_14_pairs:
        i, l = int(i), int(l)
        if i == l:
            continue
        if coul[i, l] != 0.0:
            coul[i, l] = coul[l, i] = SCEE
            lj[i, l] = lj[l, i] = SCNB
    return coul, lj


def enumerate_angles(num_atoms: int, bonds: np.ndarray) -> np.ndarray:
    """All bonded triples (i, j, k), i < k, centered on j."""
    adj = [[] for _ in range(num_atoms)]
    for i, j in bonds:
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    out = []
    for j in range(num_atoms):
        nb = sorted(adj[j])
        for a in range(len(nb)):
            for b in range(a + 1, len(nb)):
                out.append((nb[a], j, nb[b]))
    return np.array(out, dtype=np.int32).reshape(-1, 3)


def enumerate_propers(num_atoms: int, bonds: np.ndarray) -> np.ndarray:
    """All bonded quadruples (i, j, k, l) around each central bond j-k."""
    adj = [[] for _ in range(num_atoms)]
    for i, j in bonds:
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    out = []
    for j, k in [(int(a), int(b)) for a, b in bonds]:
        for i in adj[j]:
            if i == k:
                continue
            for l in adj[k]:
                if l == j or l == i:
                    continue
                out.append((i, j, k, l))
    return np.array(out, dtype=np.int32).reshape(-1, 4)
