"""Model-vs-MD evaluation diagnostics.

Counterparts of the reference's evaluation helpers:
- ``sample_on_batches``: conditional samples + forward/reverse likelihoods +
  acceptance probabilities on data-conditioned states
  (reference: utils/evaluation_utils.py:190-353)
- ``kinetic_energy_ks``: KS test of sampled kinetic energies against the
  chi-squared(3V) equipartition distribution (reference: evaluate.py:720-746)
- ``energy_histogram_overlap``: potential-energy parity between chain and MD
"""
import dataclasses
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ConditionalDiagnostics:
    y_coords_model: np.ndarray  # [N, V, 3]
    y_velocs_model: np.ndarray
    acceptance: np.ndarray  # [N]
    p_xy: np.ndarray  # [N]
    p_yx: np.ndarray  # [N]
    p_xy_training: np.ndarray  # [N] likelihood of the MD target pair
    p_yx_training: np.ndarray

    @property
    def mean_acceptance(self) -> float:
        return float(self.acceptance.mean())


def sample_on_batches(
    model,
    params,
    batch,
    energy_fn,
    masses: jnp.ndarray,
    kT: float,
    rng: jax.Array,
    random_velocs: bool = True,
) -> ConditionalDiagnostics:
    """Draw one conditional sample per data state and compute the MH
    acceptance it would get, plus likelihoods of the actual MD targets."""
    from timewarp_tpu.sampling.mh import kinetic_energy

    B = batch.atom_types.shape[0]
    if random_velocs:
        k1, k2, rng = jax.random.split(rng, 3)
        x_velocs = jax.random.normal(k1, batch.atom_velocs.shape)
        y_velocs_t = jax.random.normal(k2, batch.atom_veloc_targets.shape)
    else:
        x_velocs = batch.atom_velocs
        y_velocs_t = batch.atom_veloc_targets

    yc, yv, p_xy = model.apply(
        params, rng, batch.atom_types, batch.atom_coords, x_velocs,
        batch.masked_elements, 1, method="conditional_sample_with_logp",
    )
    yc, yv, p_xy = yc[0], yv[0], p_xy[0]

    flip = 1.0 if random_velocs else -1.0
    p_yx = model.apply(
        params, batch.atom_types, yc, flip * yv, batch.atom_coords,
        flip * x_velocs, batch.masked_elements, method="log_likelihood",
    )

    e_pot = energy_fn(yc) - energy_fn(batch.atom_coords)
    e_kin = kinetic_energy(yv, masses, kT, random_velocs) - kinetic_energy(
        x_velocs, masses, kT, random_velocs
    )
    exponent = e_pot + e_kin + p_xy - p_yx
    acceptance = jnp.minimum(1.0, jnp.exp(-exponent))

    p_xy_t = model.apply(
        params, batch.atom_types, batch.atom_coords, x_velocs,
        batch.atom_coord_targets, y_velocs_t, batch.masked_elements,
        method="log_likelihood",
    )
    p_yx_t = model.apply(
        params, batch.atom_types, batch.atom_coord_targets, flip * y_velocs_t,
        batch.atom_coords, flip * x_velocs, batch.masked_elements,
        method="log_likelihood",
    )

    return ConditionalDiagnostics(
        y_coords_model=np.asarray(yc),
        y_velocs_model=np.asarray(yv),
        acceptance=np.asarray(acceptance),
        p_xy=np.asarray(p_xy),
        p_yx=np.asarray(p_yx),
        p_xy_training=np.asarray(p_xy_t),
        p_yx_training=np.asarray(p_yx_t),
    )


def kinetic_energy_ks(velocs: np.ndarray, masses: np.ndarray, kT: float) -> float:
    """KS statistic of 2*KE/kT against chi2(3V)
    (reference: evaluate.py:720-746)."""
    from scipy import stats

    ke = 0.5 * (masses[None, :, None] * velocs**2).sum((1, 2)) / kT
    return float(stats.kstest(2 * ke, stats.chi2(3 * len(masses)).cdf).statistic)


def energy_histogram_overlap(e_a: np.ndarray, e_b: np.ndarray, bins: int = 50) -> float:
    """Histogram intersection of two potential-energy distributions in [0,1]."""
    lo = min(e_a.min(), e_b.min())
    hi = max(e_a.max(), e_b.max())
    ha, _ = np.histogram(e_a, bins=bins, range=(lo, hi), density=False)
    hb, _ = np.histogram(e_b, bins=bins, range=(lo, hi), density=False)
    ha = ha / ha.sum()
    hb = hb / hb.sum()
    return float(np.minimum(ha, hb).sum())
