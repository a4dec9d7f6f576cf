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


HEAVY_TICA_ELEMENTS = ("C", "N", "S")


def tica_features_full(coords: np.ndarray, topology: Topology) -> np.ndarray:
    """The reference's TICA feature set (reference: utils/tica_utils.py:7-37):
    pairwise distances between C/N/S atoms plus sin/cos of backbone
    torsions. Deviation, documented: the reference wraps (phi, phi, omega)
    -- its ``psi`` line calls ``md.compute_phi`` twice (tica_utils.py:26-27);
    we use the actual (phi, psi), which can only make the feature set more
    informative, and omit omega (trans-planar, ~constant for our peptides)."""
    heavy = [
        i for i, a in enumerate(topology.atoms) if a.element in HEAVY_TICA_ELEMENTS
    ]
    xyz = np.asarray(coords)[:, heavy]
    m, n = np.triu_indices(len(heavy), k=1)
    dists = np.linalg.norm(xyz[:, m] - xyz[:, n], axis=-1)
    return np.concatenate([dists, torsion_features(coords, topology)], axis=-1)


class TICAModel:
    """Fit-once / transform-many TICA (symmetrized estimator, generalized
    symmetric eigenproblem C_lag v = l C_0 v). The reference fits deeptime's
    TICA on the MD trajectory and projects both MD and model chains through
    the same model (reference: notebooks/Paper/speed-up-mcmc.ipynb cell 8)."""

    def __init__(self, mean: np.ndarray, components: np.ndarray, eigvals: np.ndarray):
        self.mean = mean
        self.components = components  # [F, dim]
        self.eigvals = eigvals

    @classmethod
    def fit(cls, features, lag: int = 100, dim: int = 2) -> "TICAModel":
        """``features``: [T, F] array or a list of per-trajectory [T_i, F]
        arrays; covariances accumulate per trajectory so lagged pairs never
        cross independent-walker boundaries."""
        from scipy.linalg import eigh

        trajs = (
            [np.asarray(features, dtype=np.float64)]
            if isinstance(features, np.ndarray) and features.ndim == 2
            else [np.asarray(f, dtype=np.float64) for f in features]
        )
        mean = np.concatenate(trajs).mean(axis=0)
        F = trajs[0].shape[1]
        c0 = np.zeros((F, F))
        ct = np.zeros((F, F))
        n = 0
        for t in trajs:
            if len(t) <= lag:
                continue
            x = t - mean
            x0, xt = x[:-lag], x[lag:]
            c0 += x0.T @ x0 + xt.T @ xt
            ct += x0.T @ xt + xt.T @ x0
            n += 2 * len(x0)
        if n == 0:
            raise ValueError(f"no trajectory longer than lag={lag}")
        c0 /= n
        ct /= n
        c0 += 1e-8 * np.eye(F)
        evals, evecs = eigh(ct, c0)
        order = np.argsort(evals)[::-1]
        return cls(mean, evecs[:, order[:dim]], evals[order[:dim]])

    def transform(self, features: np.ndarray) -> np.ndarray:
        return (np.asarray(features, dtype=np.float64) - self.mean) @ self.components


def autocorrelation(x: np.ndarray, max_lag: int = None) -> np.ndarray:
    """FFT-based normalized autocorrelation of a 1-D series (the arviz
    ``az.autocorr`` the reference notebook uses)."""
    x = np.asarray(x, dtype=np.float64).ravel()
    n = len(x)
    x = x - x.mean()
    nfft = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, nfft)
    acov = np.fft.irfft(f * np.conj(f))[:n] / n
    rho = acov / acov[0] if acov[0] > 0 else np.zeros(n)
    return rho[:max_lag] if max_lag else rho


def ess_per_sample(rho: np.ndarray) -> float:
    """Effective-sample-size fraction from an autocorrelation curve,
    truncated at the first non-positive lag -- exactly the notebook's
    ``ESS`` (reference: speed-up-mcmc.ipynb cell 7):
    Neff/N = 1 / (-1 + 2 * sum_{t<t0} |rho_t|), rho_0 = 1 included."""
    rho = np.asarray(rho)
    nonpos = np.nonzero(rho <= 0)[0]
    cut = int(nonpos[0]) if len(nonpos) else len(rho)
    denom = -1.0 + 2.0 * np.abs(rho[:cut]).sum()
    return float(1.0 / max(denom, 1.0))


def pooled_autocorrelation(series, max_lag: int = None) -> np.ndarray:
    """Variance-weighted autocorrelation pooled over independent chains:
    rho(t) = sum_c acov_c(t) / sum_c acov_c(0).

    Averaging per-chain ESS instead is WRONG for multi-walker MD: a walker
    stuck in one basin has a flat, low-variance TIC series whose own
    autocorrelation looks like white noise (apparent ESS ~1), and the mean
    is dominated by exactly the walkers that mixed least. Pooling
    autocovariances weights each chain by the variance it actually
    explored."""
    series = [np.asarray(s, dtype=np.float64).ravel() for s in series]
    mean = np.mean(np.concatenate(series))
    n = min(len(s) for s in series)
    acov = np.zeros(n)
    for s in series:
        x = s - mean
        m = len(x)
        nfft = 1 << (2 * m - 1).bit_length()
        f = np.fft.rfft(x, nfft)
        acov[: min(m, n)] += np.fft.irfft(f * np.conj(f))[: min(m, n)] / m
    if acov[0] <= 0:
        return np.zeros(n)
    rho = acov / acov[0]
    return rho[:max_lag] if max_lag else rho


def tic_coverage_gap(tics_ref: np.ndarray, tics_model: np.ndarray, stride: int = 10) -> float:
    """Max over reference TIC points of the min distance to any model point,
    in per-axis-normalized TIC(0,1) space -- the notebook's missing-state
    check (speed-up-mcmc.ipynb cell 8: gap >= 0.3 means the model chain
    missed states and its speed-up is recorded as 0)."""
    from scipy.spatial import distance

    a = np.asarray(tics_ref)[::stride, :2]
    b = np.asarray(tics_model)[::stride, :2]
    ranges = np.abs(a).max(axis=0)
    ranges[ranges == 0] = 1.0
    d = distance.cdist(a / ranges, b / ranges)
    return float(d.min(axis=1).max())


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
