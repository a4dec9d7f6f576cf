"""Pure-JAX AMBER potential energy (implicit solvent).

Replaces the reference's OpenMM bridge (reference:
utils/openmm/openmm_bridge.py:63-307): the full potential -- harmonic
bonds/angles, periodic torsions, Lennard-Jones, Coulomb with optional
reaction-field cutoff, GB-OBC generalized Born with ACE surface area -- is
one differentiable XLA program. Forces are ``-jax.grad``; batches of
conformations are ``jax.vmap``.

Conventions follow OpenMM's standard forces so energies are comparable to
the reference's trajectories:
- bonds:    E = k/2 (r - r0)^2                      (k in kJ/mol/nm^2)
- angles:   E = k/2 (theta - theta0)^2              (k in kJ/mol/rad^2)
- torsions: E = k (1 + cos(n phi - phase))
- LJ:       E = 4 eps ((sigma/r)^12 - (sigma/r)^6), Lorentz-Berthelot mixing
- Coulomb (reaction field, CutoffNonPeriodic):
            E = q_i q_j / (4 pi eps0) (1/r + k_rf r^2 - c_rf), r < cutoff
- GB-OBC I/II Born radii + pairwise GB energy + ACE SA term
"""
from typing import Dict

import jax
import jax.numpy as jnp

from timewarp_tpu.physics.constants import ONE_4PI_EPS0
from timewarp_tpu.physics.system import AmberSystem

GB_OFFSET = 0.009  # nm, dielectric offset of the OBC model
GB_PROBE = 0.14  # nm, solvent probe radius for the ACE SA term

# OBC rescaling coefficients (alpha, beta, gamma).
OBC_PARAMS = {"obc1": (0.8, 0.0, 2.909125), "obc2": (1.0, 0.8, 4.85)}


def _gather(coords, idx):
    return coords[idx]  # [N, k, 3] via advanced indexing


def bond_energy(system: AmberSystem, coords: jnp.ndarray) -> jnp.ndarray:
    p = _gather(coords, system.bond_idx)  # [Nb, 2, 3]
    r = jnp.linalg.norm(p[:, 0] - p[:, 1] + 1e-12, axis=-1)
    return (0.5 * system.bond_k * (r - system.bond_r0) ** 2).sum()


def angle_energy(system: AmberSystem, coords: jnp.ndarray) -> jnp.ndarray:
    p = _gather(coords, system.angle_idx)  # [Na, 3, 3]
    v1 = p[:, 0] - p[:, 1]
    v2 = p[:, 2] - p[:, 1]
    cos = (v1 * v2).sum(-1) / jnp.sqrt(
        ((v1 * v1).sum(-1) * (v2 * v2).sum(-1)) + 1e-12
    )
    theta = jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
    return (0.5 * system.angle_k * (theta - system.angle_theta0) ** 2).sum()


def dihedral_angle(p0, p1, p2, p3):
    """Signed dihedral about the p1-p2 axis, [-pi, pi]."""
    b0 = p1 - p0
    b1 = p2 - p1
    b2 = p3 - p2
    n1 = jnp.cross(b0, b1)
    n2 = jnp.cross(b1, b2)
    # sqrt(x + eps), not linalg.norm + eps: norm's gradient at exactly zero
    # (coincident atoms -- padding rows, degenerate proposals) is NaN.
    b1n = b1 / jnp.sqrt((b1 * b1).sum(-1, keepdims=True) + 1e-24)
    m1 = jnp.cross(n1, b1n)
    x = (n1 * n2).sum(-1)
    y = (m1 * n2).sum(-1)
    # arctan2's gradient at (0, 0) is NaN. Degenerate quadruples (coincident/
    # collinear atoms -- always the case for zero-k padding terms that index
    # atom 0 four times, and possible for garbage flow proposals) would
    # poison the whole gradient even when multiplied by k=0. Substitute the
    # well-conditioned point (1, 0) there; the where() routes a zero
    # cotangent to the degenerate branch, keeping everything finite.
    degenerate = (x * x + y * y) < 1e-18
    x = jnp.where(degenerate, 1.0, x)
    y = jnp.where(degenerate, 0.0, y)
    return jnp.arctan2(y, x)


def torsion_energy(system: AmberSystem, coords: jnp.ndarray) -> jnp.ndarray:
    p = _gather(coords, system.torsion_idx)  # [Nt, 4, 3]
    phi = dihedral_angle(p[:, 0], p[:, 1], p[:, 2], p[:, 3])
    return (
        system.torsion_k * (1.0 + jnp.cos(system.torsion_n * phi - system.torsion_phase))
    ).sum()


# Distance floor (nm). Physical conformations never get below ~0.09 nm
# (an H-X bond), but garbage inputs -- untrained-flow proposals, padded
# dummy rows -- can collide atoms, overflowing r^-12 to inf and poisoning
# gradients through jnp.where (NaN even on masked branches). Clamping far
# below the physical regime leaves real energies bit-identical while keeping
# the loss and its gradient finite everywhere.
R_MIN = 0.01


def _pairwise_r(coords: jnp.ndarray, eps: float = 1e-12):
    diff = coords[:, None, :] - coords[None, :, :]
    r2 = (diff * diff).sum(-1)
    # Guard the diagonal (scale matrices zero it out of the energy).
    r2 = r2 + jnp.eye(coords.shape[0], dtype=coords.dtype)
    return jnp.sqrt(jnp.maximum(r2, R_MIN * R_MIN) + eps), r2


def nonbonded_energy(system: AmberSystem, coords: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    V = coords.shape[0]
    r, _ = _pairwise_r(coords)

    # Lorentz-Berthelot mixing.
    sigma = 0.5 * (system.lj_sigma[:, None] + system.lj_sigma[None, :])
    eps = jnp.sqrt(system.lj_epsilon[:, None] * system.lj_epsilon[None, :])
    sr6 = (sigma / r) ** 6
    e_lj_pair = 4.0 * eps * (sr6 * sr6 - sr6) * system.scale_lj

    qq = system.charges[:, None] * system.charges[None, :] * ONE_4PI_EPS0

    # OpenMM treats 1-4 pairs as "exceptions": plain (scaled) Coulomb + LJ,
    # no reaction field, no cutoff. Full-strength pairs get reaction-field
    # electrostatics and truncated LJ when a cutoff is set.
    is_full = system.scale_coul >= 1.0
    is_except = (system.scale_coul > 0.0) & ~is_full

    if system.cutoff is not None:
        within = (r < system.cutoff) & is_full
        if system.use_reaction_field:
            rc = system.cutoff
            eps_rf = system.solvent_dielectric
            krf = (1.0 / rc**3) * (eps_rf - 1.0) / (2.0 * eps_rf + 1.0)
            crf = (1.0 / rc) * 3.0 * eps_rf / (2.0 * eps_rf + 1.0)
            e_coul_full = qq * (1.0 / r + krf * r * r - crf)
        else:
            e_coul_full = qq / r
        e_coul_pair = jnp.where(within, e_coul_full, 0.0)
        e_lj_pair_kept = jnp.where(within, e_lj_pair, 0.0)
    else:
        e_coul_pair = jnp.where(is_full, qq / r, 0.0)
        e_lj_pair_kept = jnp.where(is_full, e_lj_pair, 0.0)

    e_coul_pair = e_coul_pair + jnp.where(
        is_except, qq * system.scale_coul / r, 0.0
    )
    e_lj_pair_kept = e_lj_pair_kept + jnp.where(is_except, e_lj_pair, 0.0)

    return {
        "lj": 0.5 * e_lj_pair_kept.sum(),
        "coulomb": 0.5 * e_coul_pair.sum(),
    }


def born_radii(system: AmberSystem, coords: jnp.ndarray) -> jnp.ndarray:
    """OBC Born radii (HCT pairwise descreening + OBC tanh rescaling).

    Follows the OBC paper / OpenMM's GBSAOBC implementation.
    """
    V = coords.shape[0]
    r, _ = _pairwise_r(coords)
    off_diag = 1.0 - jnp.eye(V, dtype=coords.dtype)

    rho = system.gb_radii - GB_OFFSET  # offset radii [V]
    sr = system.gb_screen * rho  # scaled radii [V]

    rho_i = rho[:, None]
    sr_j = sr[None, :]

    # HCT integral I_ij, computed for all pairs then masked.
    L = jnp.maximum(jnp.abs(r - sr_j), rho_i)
    U = r + sr_j
    inv_l, inv_u = 1.0 / L, 1.0 / U
    term = (
        inv_l
        - inv_u
        + 0.25 * (r - sr_j * sr_j / r) * (inv_u * inv_u - inv_l * inv_l)
        + 0.5 / r * jnp.log(L / U)
    )
    # Close-pair correction when atom i sits inside the descreening sphere.
    term = term + jnp.where(
        rho_i < sr_j - r, 2.0 * (1.0 / rho_i - inv_l), 0.0
    )
    # Only pairs where the spheres interact (U > L) contribute; exclude self.
    term = jnp.where((sr_j > 0.0) & (U > L), term, 0.0) * off_diag

    I = 0.5 * term.sum(axis=1)  # [V]
    psi = I * rho
    alpha, beta, gamma = OBC_PARAMS[system.gb_model]
    tanh_arg = alpha * psi - beta * psi * psi + gamma * psi * psi * psi
    inv_b = 1.0 / rho - jnp.tanh(tanh_arg) / system.gb_radii
    return 1.0 / inv_b


def gb_energy(system: AmberSystem, coords: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    if system.gb_model is None or system.gb_radii.size == 0:
        zero = jnp.zeros((), coords.dtype)
        return {"gb": zero, "sa": zero}
    V = coords.shape[0]
    B = born_radii(system, coords)  # [V]
    r, r2m = _pairwise_r(coords)
    # f_GB with the true r^2 (diagonal handled explicitly below).
    diff = coords[:, None, :] - coords[None, :, :]
    r2 = (diff * diff).sum(-1)
    bb = B[:, None] * B[None, :]
    f_gb = jnp.sqrt(r2 + bb * jnp.exp(-r2 / (4.0 * bb)))
    qq = system.charges[:, None] * system.charges[None, :]
    pref = -ONE_4PI_EPS0 * (
        1.0 / system.solute_dielectric - 1.0 / system.solvent_dielectric
    )
    # Off-diagonal pairs count once (0.5 * sum over full matrix), the i=j
    # self term is qi^2 / B_i with weight 0.5.
    e_pair = pref * qq / f_gb
    if system.cutoff is not None:
        # OpenMM's GBSAOBCForce under CutoffNonPeriodic subtracts
        # q_i q_j / r_cutoff from every off-diagonal pair within the cutoff
        # and skips pairs beyond it (self terms are unshifted). For a solute
        # smaller than the cutoff this is a constant offset, but it is part
        # of OpenMM's energy convention and the golden data includes it.
        eye = jnp.eye(V, dtype=bool)
        within = (r2 < system.cutoff * system.cutoff) & ~eye
        e_pair = jnp.where(
            eye, e_pair, jnp.where(within, e_pair - pref * qq / system.cutoff, 0.0)
        )
    e_gb = 0.5 * e_pair.sum()

    # ACE surface-area term (OpenMM GBSAOBCForce's default SA model). The
    # 28.3919551 kJ/mol/nm^2 constant already includes the 4*pi factor
    # (it equals 4*pi * 2.25936 kJ/mol/nm^2 surface tension). Dummy padding
    # atoms (mass 0, see physics/provider.py) are excluded.
    ratio = system.gb_radii / B
    real = (system.masses > 0.0).astype(coords.dtype)
    e_sa = (
        system.surface_tension * (system.gb_radii + GB_PROBE) ** 2 * ratio**6 * real
    ).sum()
    return {"gb": e_gb, "sa": e_sa}


def potential_energy_terms(
    system: AmberSystem, coords: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Per-force-type decomposition (the reference exposes the same split via
    OpenMM force groups, reference: simulation/md.py:288-356)."""
    terms = {
        "bond": bond_energy(system, coords),
        "angle": angle_energy(system, coords),
        "torsion": torsion_energy(system, coords),
    }
    terms.update(nonbonded_energy(system, coords))
    terms.update(gb_energy(system, coords))
    return terms


def potential_energy(system: AmberSystem, coords: jnp.ndarray) -> jnp.ndarray:
    """Total potential in kJ/mol for one conformation [V, 3]."""
    terms = potential_energy_terms(system, coords)
    return sum(terms.values())


def forces(system: AmberSystem, coords: jnp.ndarray) -> jnp.ndarray:
    """-dE/dx in kJ/mol/nm."""
    return -jax.grad(lambda c: potential_energy(system, c))(coords)


def batched_potential_energy(system: AmberSystem, coords: jnp.ndarray) -> jnp.ndarray:
    """[B, V, 3] -> [B]."""
    return jax.vmap(lambda c: potential_energy(system, c))(coords)
