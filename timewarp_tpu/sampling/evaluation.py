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


def sample_vs_md_conditional(
    model,
    params,
    system,
    x_coords: jnp.ndarray,  # [V, 3] single conditioning state
    atom_types: jnp.ndarray,  # [1, V]
    num_samples: int,
    step_width: int,
    rng: jax.Array,
    temperature: float = 310.0,
):
    """Model conditional samples vs on-device MD segments from one state
    (reference: utils/evaluation_utils.py:356-413, with the OpenMM stepper
    replaced by the vmapped JAX Langevin engine).

    Returns (model_coords [S, V, 3], md_coords [S, V, 3]).
    """
    from timewarp_tpu.physics.integrator import (
        LangevinConfig,
        maxwell_boltzmann_velocities,
        run_segment,
    )

    V = x_coords.shape[0]
    mask = jnp.zeros((1, V), bool)
    k_model, k_md = jax.random.split(rng)

    x_velocs = jax.random.normal(k_model, (1, V, 3))
    yc, _, _ = model.apply(
        params, k_model, atom_types, x_coords[None], x_velocs, mask,
        num_samples, method="conditional_sample_with_logp",
    )
    model_coords = yc[:, 0]

    cfg = LangevinConfig(temperature=temperature)
    keys = jax.random.split(k_md, num_samples)
    velocs0 = jax.vmap(
        lambda k: maxwell_boltzmann_velocities(system, k, temperature)
    )(keys)
    md_coords, _ = jax.jit(
        jax.vmap(
            lambda v, k: run_segment(
                system, x_coords, v, k, num_steps=step_width, config=cfg
            )
        )
    )(velocs0, keys)
    return np.asarray(model_coords), np.asarray(md_coords)


def kinetic_energy_ks(velocs: np.ndarray, masses: np.ndarray, kT: float) -> float:
    """KS statistic of 2*KE/kT against chi2(3V)
    (reference: evaluate.py:720-746)."""
    from scipy import stats

    ke = 0.5 * (masses[None, :, None] * velocs**2).sum((1, 2)) / kT
    return float(stats.kstest(2 * ke, stats.chi2(3 * len(masses)).cdf).statistic)


def energy_histogram_overlap(
    e_a: np.ndarray, e_b: np.ndarray, bins: int = 50, center: bool = False
) -> float:
    """Histogram intersection of two potential-energy distributions in [0,1].

    ``center=True`` subtracts each set's median first. The JAX AMBER
    potential carries a convention-level CONSTANT offset vs OpenMM
    (~236 kJ/mol on the 2olx golden fixture; torsion-k and GB/SA constant
    conventions -- tests/test_physics.py:62-68). The offset cancels in every
    MH energy *difference*, but an uncentered histogram intersection of our
    energies against reference-computed energies would silently report ~0
    overlap -- so pass center=True when (and only when) the two sets come
    from DIFFERENT potentials. The default is uncentered: when both sets
    come from the same potential a genuine mean-energy shift (e.g. proposal
    heat in an MH chain) must show up as low overlap, not be subtracted
    away (ADVICE round 3, item 1)."""
    e_a = np.asarray(e_a, dtype=np.float64)
    e_b = np.asarray(e_b, dtype=np.float64)
    if center:
        e_a = e_a - np.median(e_a)
        e_b = e_b - np.median(e_b)
    lo = min(e_a.min(), e_b.min())
    hi = max(e_a.max(), e_b.max())
    ha, _ = np.histogram(e_a, bins=bins, range=(lo, hi), density=False)
    hb, _ = np.histogram(e_b, bins=bins, range=(lo, hi), density=False)
    ha = ha / ha.sum()
    hb = hb / hb.sum()
    return float(np.minimum(ha, hb).sum())
