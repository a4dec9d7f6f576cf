"""Internal-coordinate conditional flow: the round-5 proposal family.

Wraps ANY ConditionalFlowDensity (models/flow.py) so that its [V, 3]
"coordinate" target is the packed z-matrix representation of y relative to
the conditioning state x (models/internal_coords.py) instead of Cartesian
coordinates:

    target grid = standardize( r, theta, atanh(dphi / pi) )  + ghosts

- bonds/angles are ABSOLUTE internals (the stiff channels become correct
  by construction -- the round-4 diagnosis showed a Cartesian-trained
  flow's conditional concentrates on the physical-mode manifold and
  cannot be repaired post-hoc, ROUND4.md),
- torsions are WRAPPED DISPLACEMENTS from x's torsions, mapped through
  atanh so the latent is unbounded while phi_y covers the circle exactly
  once (no 2-pi aliasing; exact density),
- the 6 dead grid channels (root row, slot-1, slot-2 remainders) carry
  iid N(0,1) GHOST values: the augmented target pi(y) phi(ghost) keeps
  every density normalized over shape space (the same trick the protocol
  already uses for velocities). Ghosts are resampled each MH iteration
  and discarded after unpacking.

Velocities pass through unchanged (the inner flow models them as before).
All densities are exact: log q(y, ghost | x) = log q_inner(grid | x)
+ log|d grid / d y_shape|, with the measure convention that makes
shape-space MH ratios correct (internal_coords.py).

The reference has no internal-coordinate model family; this follows the
standard resolution used by internal-coordinate Boltzmann generators.
"""
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.models.internal_coords import (
    internal_channel_mask,
    pack_relative,
    unpack_relative,
)
from timewarp_tpu.models.recalibration import ZMatrix

_ATANH_CLIP = 1.0 - 1e-6


@dataclasses.dataclass(frozen=True)
class InternalFlow:
    """Functional wrapper; ``model`` is a built ConditionalFlowDensity whose
    config must have use_displacement_as_target=False (the wrapper builds
    its own relative representation)."""

    model: object
    zm: ZMatrix
    r_scale: float = 0.005  # nm, typical bond std
    th_scale: float = 0.05  # rad, typical angle std
    phi_scale: float = 1.0  # atanh-units

    def _grids(self):
        mask = internal_channel_mask(self.zm)  # [V, 3]
        scales = np.array([self.r_scale, self.th_scale, self.phi_scale], np.float32)
        # center bonds/angles at the template values so the latent is
        # roughly zero-mean; torsions are displacements already
        return jnp.asarray(mask), jnp.asarray(scales)

    def to_grid(
        self, y_coords: jnp.ndarray, x_coords: jnp.ndarray, center: jnp.ndarray,
        ghost: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One molecule [V, 3] -> latent grid [V, 3] + logdet of the map
        (measure + atanh + standardization), dead channels <- ghost."""
        mask, scales = self._grids()
        packed, ld = pack_relative(y_coords, x_coords, self.zm)
        t = jnp.clip(packed[:, 2] / np.pi, -_ATANH_CLIP, _ATANH_CLIP)
        u_phi = jnp.arctanh(t)
        # d u / d phi = 1 / (pi (1 - t^2)); live phi channels only
        phi_mask = mask[:, 2]
        ld = ld + (phi_mask * (-jnp.log(np.pi) - jnp.log1p(-(t * t)))).sum()
        grid = packed.at[:, 2].set(u_phi)
        grid = (grid - center) / scales[None, :]
        ld = ld - (mask * jnp.log(scales)[None, :]).sum()
        grid = jnp.where(mask > 0, grid, ghost)
        return grid, ld

    def from_grid(
        self, grid: jnp.ndarray, x_coords: jnp.ndarray, center: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Latent grid -> (y_coords, ghost, logdet-of-to_grid-at-y)."""
        mask, scales = self._grids()
        ghost = jnp.where(mask > 0, 0.0, grid)
        packed = grid * scales[None, :] + center
        u_phi = packed[:, 2]
        t = jnp.tanh(u_phi)
        packed = packed.at[:, 2].set(np.pi * t)
        packed = jnp.where(mask > 0, packed, 0.0)
        y, ld_unpack = unpack_relative(packed, x_coords, self.zm)
        phi_mask = mask[:, 2]
        ld = -ld_unpack  # logdet of pack at y
        ld = ld + (phi_mask * (-jnp.log(np.pi) - jnp.log1p(-(t * t)))).sum()
        ld = ld - (mask * jnp.log(scales)[None, :]).sum()
        return y, ghost, ld

    def template_center(self, template_coords: np.ndarray) -> jnp.ndarray:
        """[V, 3] grid center: template bonds/angles, zero torsion disp."""
        from timewarp_tpu.models.internal_coords import pack_internals

        p, _ = pack_internals(jnp.asarray(template_coords), self.zm)
        return jnp.asarray(np.asarray(p) * np.array([1.0, 1.0, 0.0]))

    # --- density / sampling (single molecule, unpadded; mh.py style) ---

    def log_likelihood(
        self, params, atom_types, x_coords, x_velocs, y_coords, y_velocs,
        masked_elements, center, ghost,
    ):
        """log q(y, y_velocs, ghost | x): [K]-batched y against one x."""
        K = y_coords.shape[0]
        grids, lds = jax.vmap(
            lambda yc, g: self.to_grid(yc, x_coords, center, g)
        )(y_coords, ghost)
        lp = self.model.apply(
            params,
            jnp.tile(atom_types, (K, 1)),
            jnp.tile(x_coords[None], (K, 1, 1)),
            jnp.tile(x_velocs[None], (K, 1, 1)),
            grids,
            y_velocs,
            jnp.tile(masked_elements, (K, 1)),
            method="log_likelihood",
        )
        return lp + lds

    def sample_with_logp(
        self, params, rng, atom_types, x_coords, x_velocs, masked_elements,
        center, K,
    ):
        """Returns (y_coords [K,V,3], y_velocs, ghost [K,V,3], logp [K])."""
        grids, yv, lp = self.model.apply(
            params,
            rng,
            atom_types,
            x_coords[None],
            x_velocs[None],
            masked_elements,
            K,
            method="conditional_sample_with_logp",
        )
        grids, yv, lp = grids[:, 0], yv[:, 0], lp[:, 0]
        y, ghost, lds = jax.vmap(
            lambda g: self.from_grid(g, x_coords, center)
        )(grids)
        return y, yv, ghost, lp + lds


def make_internal_flow_proposal(
    iflow: InternalFlow, atom_types, masked_elements, center
):
    """(propose_fn, reverse_logp_fn) in sampling/mh.py conventions for the
    internal-coordinate flow. Ghost bookkeeping is folded into the
    returned log-densities exactly (the reverse ghost for x is drawn
    inside propose, which also evaluates the full reverse density -- the
    same folding the involutive channel swap uses):

        p_xy = log q(y, yv, g_y | x) + 0.5|g_y|^2
               - [log q(x0-aug | y) + 0.5|g_x|^2] ... folded reverse
        p_yx = 0
    """

    def _reverse(params, y_coords, y_velocs, x_coords, x_velocs, g_x):
        """log q(x, xv, g_x | y, yv) per proposal."""

        def one(yc, yv_k, g):
            grid, ld = iflow.to_grid(x_coords, yc, center, g)
            lp = iflow.model.apply(
                params,
                atom_types,
                yc[None],
                yv_k[None],
                grid[None],
                x_velocs[None],
                masked_elements,
                method="log_likelihood",
            )
            return lp[0] + ld

        return jax.vmap(one)(y_coords, y_velocs, g_x)

    def propose_fn(params, rng, x_coords, x_velocs, K):
        k_s, k_g = jax.random.split(rng)
        y, yv, g_y, lp_fwd = iflow.sample_with_logp(
            params, k_s, atom_types, x_coords, x_velocs, masked_elements,
            center, K,
        )
        # augmented-target ghost terms: pi~(y, g) = pi(y) phi(g); the
        # exponent needs +0.5|g_y|^2 - 0.5|g_x|^2 plus the full forward /
        # reverse density difference. The reverse ghost g_x is drawn here
        # and the reverse density folded in (reverse_logp_fn returns 0).
        V = x_coords.shape[0]
        mask, _ = iflow._grids()
        dead = 1.0 - mask
        g_x = jax.random.normal(k_g, (K, V, 3)) * dead[None]
        lp_rev = _reverse(params, y, yv, x_coords, x_velocs, g_x)
        aux = 0.5 * ((g_y * dead[None]) ** 2).sum((-1, -2)) - 0.5 * (
            (g_x * dead[None]) ** 2
        ).sum((-1, -2))
        return y, yv, lp_fwd + aux - lp_rev

    def reverse_logp_fn(params, y_coords, y_velocs, x_coords, x_velocs):
        return jnp.zeros((y_coords.shape[0],), jnp.float32)

    return propose_fn, reverse_logp_fn
