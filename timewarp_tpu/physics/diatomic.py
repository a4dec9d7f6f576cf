"""Diatomic (O2) sanity harness.

Reference: evaluate_o2.py + utils/evaluation_utils_o2.py -- a harmonic
diatomic whose equilibrium bond-length density is known analytically,
p(r) proportional to r^2 exp(-beta k/2 (r - r0)^2), used to sanity-check
conditional density models and samplers against closed-form truth.
"""
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.physics.system import AmberSystem

# O2 parameters: r0 = 0.121 nm; a stiff harmonic bond (in the spirit of the
# reference's O2 test system).
O2_R0 = 0.121  # nm
O2_K = 2.0 * 600.0 * 4.184 / 0.01  # kJ/mol/nm^2 (OpenMM k/2 convention)
O2_MASS = 15.999


def make_o2_system(k: float = O2_K, r0: float = O2_R0) -> AmberSystem:
    """Two oxygen atoms with one harmonic bond; no nonbonded/GB terms."""
    V = 2
    zeros_vv = jnp.zeros((V, V), jnp.float32)
    return AmberSystem(
        masses=jnp.full((V,), O2_MASS, jnp.float32),
        charges=jnp.zeros((V,), jnp.float32),
        bond_idx=jnp.asarray([[0, 1]], jnp.int32),
        bond_k=jnp.asarray([k], jnp.float32),
        bond_r0=jnp.asarray([r0], jnp.float32),
        angle_idx=jnp.zeros((0, 3), jnp.int32),
        angle_k=jnp.zeros((0,), jnp.float32),
        angle_theta0=jnp.zeros((0,), jnp.float32),
        torsion_idx=jnp.zeros((0, 4), jnp.int32),
        torsion_k=jnp.zeros((0,), jnp.float32),
        torsion_n=jnp.zeros((0,), jnp.float32),
        torsion_phase=jnp.zeros((0,), jnp.float32),
        lj_sigma=jnp.zeros((V,), jnp.float32),
        lj_epsilon=jnp.zeros((V,), jnp.float32),
        scale_coul=zeros_vv,
        scale_lj=zeros_vv,
        gb_radii=jnp.zeros((0,), jnp.float32),
        gb_screen=jnp.zeros((0,), jnp.float32),
        cutoff=None,
        gb_model=None,
    )


def analytic_bond_length_density(
    r: np.ndarray, k: float = O2_K, r0: float = O2_R0, temperature: float = 310.0
) -> np.ndarray:
    """Equilibrium bond-length density p(r) ~ r^2 exp(-beta k/2 (r-r0)^2),
    normalized numerically on the given grid."""
    beta = 1.0 / kbT(temperature)
    unnorm = r**2 * np.exp(-beta * 0.5 * k * (r - r0) ** 2)
    return unnorm / np.trapezoid(unnorm, r)


def bond_lengths(coords: np.ndarray) -> np.ndarray:
    """[.., 2, 3] -> [..] distances."""
    return np.linalg.norm(coords[..., 0, :] - coords[..., 1, :], axis=-1)
