"""QA checks on generated trajectory data.

Reference: simulation/checknpz.py:1-217 -- NaN/Inf detection, IQR outlier
screening on energies, and a Gelman-Rubin-style split-R stationarity check.
"""
import dataclasses
import numpy as np


@dataclasses.dataclass
class CheckReport:
    ok: bool
    issues: list

    def __str__(self):
        return "OK" if self.ok else "; ".join(self.issues)


def split_r_hat(x: np.ndarray, num_splits: int = 4) -> float:
    """Gelman-Rubin potential scale reduction over contiguous splits of one
    chain; ~1 indicates stationarity."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x) // num_splits
    if n < 2:
        return float("nan")
    chains = x[: n * num_splits].reshape(num_splits, n)
    means = chains.mean(axis=1)
    w = chains.var(axis=1, ddof=1).mean()
    b = n * means.var(ddof=1)
    var_hat = (n - 1) / n * w + b / n
    return float(np.sqrt(var_hat / w)) if w > 0 else float("nan")


def check_trajectory_npz(path_or_data, iqr_factor: float = 8.0, r_hat_max: float = 1.3) -> CheckReport:
    data = np.load(path_or_data) if isinstance(path_or_data, str) else path_or_data
    issues = []

    for key in ("positions", "velocities", "forces"):
        if key in data and not np.isfinite(np.asarray(data[key])).all():
            issues.append(f"non-finite values in {key}")

    if "energies" in data:
        e = np.asarray(data["energies"])
        if not np.isfinite(e).all():
            issues.append("non-finite energies")
        else:
            pot = e[:, 0] if e.ndim == 2 else e
            q1, q3 = np.percentile(pot, [25, 75])
            iqr = q3 - q1
            outliers = int(((pot < q1 - iqr_factor * iqr) | (pot > q3 + iqr_factor * iqr)).sum())
            if outliers:
                issues.append(f"{outliers} IQR-outlier potential energies")
            r = split_r_hat(pot)
            if np.isfinite(r) and r > r_hat_max:
                issues.append(f"split-R {r:.2f} > {r_hat_max} (non-stationary)")

    return CheckReport(ok=not issues, issues=issues)
