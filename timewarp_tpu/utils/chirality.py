"""Chirality detection as pure tensor math.

Reference: utils/chirality.py:14-171 -- find tetra-coordinated centers from
the bond graph, compute the sign of the triple product of three neighbour
displacement vectors, and flag conformations whose signs differ from a
reference state (the MH sampler adds a large energy penalty on flips,
reference: utils/evaluation_utils.py:638-642).
"""
import jax.numpy as jnp
import numpy as np

H_TYPE = 1  # index of hydrogen in the [C, H, N, O, S] element vocabulary


def find_chirality_centers(
    adj_list: np.ndarray,
    num_atoms: int,
    num_h_atoms: int = 2,
    atom_types=None,
) -> np.ndarray:
    """Chirality centers as [C, 4] (center, n1, n2, n3).

    Matches the reference's semantics (reference: utils/chirality.py:14-37):
    a candidate center appears in exactly 4 bonds; a center bonded to
    ``num_h_atoms`` or more hydrogens is EXCLUDED (its mirror image is a
    mere hydrogen permutation, physically irrelevant); the three neighbours
    are taken in bond-list order. When ``atom_types`` is None the hydrogen
    exclusion is skipped (every degree-4 center is kept).
    """
    adj = np.asarray(adj_list).reshape(-1, 2)
    degree = np.zeros(num_atoms, dtype=np.int64)
    np.add.at(degree, adj[:, 0], 1)
    np.add.at(degree, adj[:, 1], 1)
    types = None if atom_types is None else np.asarray(atom_types).reshape(-1)

    centers = []
    for c in np.nonzero(degree == 4)[0]:
        # Neighbours in the order their bonds appear in adj_list (the
        # reference's torch.where traversal order).
        nbrs = []
        for i, j in adj:
            if i == c:
                nbrs.append(int(j))
            elif j == c:
                nbrs.append(int(i))
        if types is not None:
            num_non_h = int((types[nbrs] != H_TYPE).sum())
            if num_non_h <= num_h_atoms:  # i.e. >= num_h_atoms hydrogens
                continue
        centers.append([int(c)] + nbrs[:3])
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
