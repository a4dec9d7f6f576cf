"""Host-side analysis & plotting for sampled chains vs MD data.

Counterparts of the reference's evaluation plots
(reference: utils/evaluation_utils.py:749-1084, utils/tica_utils.py,
sample.py:29-189): Ramachandran maps, bond-length histograms, potential
energy histograms, torsion transition counts, and a small numpy TICA.
Matplotlib is optional -- computation functions are importable headless.
"""

import numpy as np

from timewarp_tpu.data.pdb import Topology
from timewarp_tpu.utils.torsions import compute_torsions, phi_psi_indices


def bond_length_distributions(
    coords: np.ndarray, bonds: np.ndarray
) -> np.ndarray:
    """[T, V, 3], [E, 2] -> [T, E] bond lengths."""
    a = coords[:, bonds[:, 0]]
    b = coords[:, bonds[:, 1]]
    return np.linalg.norm(a - b, axis=-1)


def torsion_transition_counts(
    angles: np.ndarray, boundary: float = 0.0, min_separation: float = 1.0
) -> int:
    """Count metastable-state transitions of a torsion time series: sign
    changes across `boundary` with at least `min_separation` rad movement
    (reference: transition-count plots in evaluation_utils.py)."""
    a = np.asarray(angles).ravel()
    side = np.sign(a - boundary)
    changes = np.nonzero(side[1:] != side[:-1])[0]
    count = 0
    last = -np.inf
    for c in changes:
        if abs(a[c + 1] - a[c]) < min_separation and c - last > 1:
            count += 1
            last = c
    return count


def tica(features: np.ndarray, lag: int = 10, dim: int = 2):
    """Tiny TICA: solve the generalized eigenproblem C_lag v = l C_0 v on
    mean-free features [T, F]; returns (eigvals [dim], projections [T-lag? T, dim]).
    (reference: utils/tica_utils.py via deeptime -- this is the standard
    symmetrized estimator in plain numpy)."""
    x = np.asarray(features, dtype=np.float64)
    x = x - x.mean(axis=0)
    x0, xt = x[:-lag], x[lag:]
    c0 = (x0.T @ x0 + xt.T @ xt) / (2 * len(x0))
    ct = (x0.T @ xt + xt.T @ x0) / (2 * len(x0))
    # Regularize and solve.
    c0 += 1e-10 * np.eye(c0.shape[0])
    evals, evecs = np.linalg.eigh(np.linalg.solve(c0, ct))
    order = np.argsort(evals)[::-1]
    evals = evals[order][:dim]
    evecs = evecs[:, order][:, :dim]
    return evals, x @ evecs


def torsion_features(coords: np.ndarray, topology: Topology) -> np.ndarray:
    """cos/sin of phi/psi torsions as TICA features [T, 2*(P_phi+P_psi)]."""
    phi_idx, psi_idx = phi_psi_indices(topology)
    quads = np.concatenate([phi_idx, psi_idx], axis=0)
    import jax.numpy as jnp

    angles = np.asarray(compute_torsions(jnp.asarray(coords), quads))
    return np.concatenate([np.cos(angles), np.sin(angles)], axis=-1)


# ---------------------------------------------------------------------------
# Plots (lazy matplotlib).
# ---------------------------------------------------------------------------

def plot_ramachandran(phi, psi, path: str, title: str = "Ramachandran"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.hist2d(
        np.asarray(phi).ravel(), np.asarray(psi).ravel(),
        bins=72, range=[[-np.pi, np.pi], [-np.pi, np.pi]], cmap="viridis",
    )
    ax.set_xlabel(r"$\phi$")
    ax.set_ylabel(r"$\psi$")
    ax.set_title(title)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_energy_histograms(e_md, e_chain, path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(np.asarray(e_md), bins=60, alpha=0.6, density=True, label="MD")
    ax.hist(np.asarray(e_chain), bins=60, alpha=0.6, density=True, label="chain")
    ax.set_xlabel("potential energy (kT)")
    ax.legend()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_bond_histograms(coords_md, coords_chain, bonds, path: str, max_bonds: int = 12):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    md = bond_length_distributions(np.asarray(coords_md), bonds)
    ch = bond_length_distributions(np.asarray(coords_chain), bonds)
    n = min(max_bonds, bonds.shape[0])
    cols = 4
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 2.2 * rows))
    for i, ax in enumerate(np.atleast_1d(axes).ravel()[:n]):
        ax.hist(md[:, i], bins=40, alpha=0.6, density=True, label="MD")
        ax.hist(ch[:, i], bins=40, alpha=0.6, density=True, label="chain")
        ax.set_title(f"bond {i}", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
