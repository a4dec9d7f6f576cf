"""Chirality detection as pure tensor math.

Reference: utils/chirality.py:14-171 -- find tetra-coordinated centers from
the bond graph, compute the sign of the triple product of three neighbour
displacement vectors, and flag conformations whose signs differ from a
reference state (the MH sampler adds a large energy penalty on flips,
reference: utils/evaluation_utils.py:638-642).
"""
import jax.numpy as jnp
import numpy as np


def find_chirality_centers(
    adj_list: np.ndarray, num_atoms: int, num_h_atoms_max: int = 2, atom_types=None
) -> np.ndarray:
    """Centers with >= 4 bonded neighbours: [C, 4] (center, n1, n2, n3).

    Uses the first three neighbours, matching the reference's convention.
    """
    adj = [[] for _ in range(num_atoms)]
    for i, j in np.asarray(adj_list):
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    centers = []
    for c in range(num_atoms):
        if len(adj[c]) >= 4:
            nbrs = sorted(adj[c])[:3]
            centers.append([c] + nbrs)
    return np.array(centers, dtype=np.int32).reshape(-1, 4)


def chirality_signs(coords: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Sign of the triple product of neighbour displacements.

    coords: [..., V, 3]; centers: [C, 4] -> signs [..., C].
    """
    c = coords[..., centers[:, 0], :]
    v1 = coords[..., centers[:, 1], :] - c
    v2 = coords[..., centers[:, 2], :] - c
    v3 = coords[..., centers[:, 3], :] - c
    det = (jnp.cross(v1, v2) * v3).sum(-1)
    return jnp.sign(det)


def check_symmetry_change(
    coords: jnp.ndarray,  # [..., V, 3]
    centers: jnp.ndarray,  # [C, 4]
    reference_signs: jnp.ndarray,  # [C]
) -> jnp.ndarray:  # [...] bool
    """True where any chirality center flipped versus the reference."""
    signs = chirality_signs(coords, centers)
    return (signs != reference_signs).any(axis=-1)
