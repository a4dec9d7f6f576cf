"""Full internal-coordinate packing: Cartesian conformation <-> z-matrix
(r, theta, phi) with exact measure log-Jacobian.

The geometric foundation for the round-5 internal-coordinate flow variant
(ROUND4.md forward plan): modeling the proposal density natively in
internal coordinates removes the round-4 failure mode -- a Cartesian-
trained flow's conditional concentrates on the physical-mode manifold and
penalizes any internal-coordinate surgery, whereas a density DEFINED over
internals makes the stiff bond/angle channels correct by construction
(the standard resolution in internal-coordinate Boltzmann generators).

Shape-space convention: the packed representation drops the 6 global
dofs (root position + frame orientation); `unpack_internals` rebuilds in
the frame of a reference conformation (the MH conditioning state), which
makes the MH kernel act on shape space -- legitimate because the
Boltzmann target is frame-invariant; the internal measure factor
prod r^2 sin(theta) is returned so densities transform exactly.

Packing layout ([V, 3], slot-aligned with ZMatrix order; unused channels
zero and masked):
    slot 0 (root):   (0, 0, 0)
    slot 1:          (r, 0, 0)
    slot 2:          (r, theta, 0)
    slot k >= 3:     (r, theta, phi)
Total live channels = 3V - 6.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.models.recalibration import ZMatrix, _norm, _unit

_THETA_MIN = 1e-4


def internal_channel_mask(zm: ZMatrix) -> np.ndarray:
    """[V, 3] float mask of live channels in the packed representation."""
    V = zm.num_atoms
    m = np.zeros((V, 3), np.float32)
    if V > 1:
        m[1, 0] = 1.0
    if V > 2:
        m[2, :2] = 1.0
    m[3:, :] = 1.0
    return m


def pack_internals(coords: jnp.ndarray, zm: ZMatrix) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[V, 3] Cartesian -> [V, 3] packed internals, plus the measure
    log-Jacobian log|d internals / d Cartesian-shape| = -sum(2 log r +
    log sin theta). The phi convention matches unpack_internals exactly."""
    V = zm.num_atoms
    out = jnp.zeros((V, 3), coords.dtype)
    logdet = jnp.zeros((), coords.dtype)
    for k in range(1, V):
        i, ai = int(zm.order[k]), int(zm.a[k])
        d = coords[i] - coords[ai]
        r = _norm(d)
        row = [r, 0.0, 0.0]
        logdet = logdet - 2.0 * jnp.log(r)
        if k >= 2:
            bi = int(zm.b[k])
            u = _unit(coords[bi] - coords[ai])
            du = (d * u).sum(-1)
            p = d - du * u
            pn = _norm(p)
            th = jnp.clip(jnp.arctan2(pn, du), _THETA_MIN, np.pi - _THETA_MIN)
            row[1] = th
            logdet = logdet - jnp.log(jnp.sin(th))
            if k >= 3:
                ci = int(zm.c[k])
                w = coords[ci] - coords[bi]
                m0 = w - (w * u).sum(-1) * u
                m = _unit(m0)
                n = jnp.cross(u, m)
                row[2] = jnp.arctan2((p * n).sum(-1), (p * m).sum(-1))
        out = out.at[k].set(jnp.stack([jnp.asarray(v, coords.dtype) for v in row]))
    return out, logdet


def unpack_internals(
    packed: jnp.ndarray,
    zm: ZMatrix,
    frame_coords: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[V, 3] packed internals -> Cartesian conformation, anchored in the
    frame of ``frame_coords`` (root position, first-bond direction, and
    slot-2 plane are taken from it; its COM is preserved like
    recalibration.py). Returns (coords, logdet) where logdet is the
    log-Jacobian of THIS map, +sum(2 log r + log sin theta) -- the exact
    inverse of pack_internals' logdet when round-tripped."""
    V = zm.num_atoms
    out = frame_coords
    logdet = jnp.zeros((), packed.dtype)
    for k in range(1, V):
        i, ai = int(zm.order[k]), int(zm.a[k])
        r = jnp.maximum(packed[k, 0], 1e-3)
        logdet = logdet + 2.0 * jnp.log(r)
        if k == 1:
            u_frame = _unit(frame_coords[i] - frame_coords[ai])
            new_pos = out[ai] + r * u_frame
        else:
            bi = int(zm.b[k])
            th = jnp.clip(packed[k, 1], _THETA_MIN, np.pi - _THETA_MIN)
            logdet = logdet + jnp.log(jnp.sin(th))
            u = _unit(out[bi] - out[ai])
            if k == 2:
                # plane from the reference frame's slot-2 atom
                d_f = frame_coords[i] - frame_coords[ai]
                u_f = _unit(frame_coords[bi] - frame_coords[ai])
                p_f = d_f - (d_f * u_f).sum(-1) * u_f
                m = _unit(p_f)
                dir_out = jnp.cos(th) * u + jnp.sin(th) * m
            else:
                ci = int(zm.c[k])
                w = out[ci] - out[bi]
                m0 = w - (w * u).sum(-1) * u
                m = _unit(m0)
                n = jnp.cross(u, m)
                phi = packed[k, 2]
                dir_out = jnp.cos(th) * u + jnp.sin(th) * (
                    jnp.cos(phi) * m + jnp.sin(phi) * n
                )
            new_pos = out[ai] + r * dir_out
        out = out.at[i].set(new_pos)
    out = out + (frame_coords.mean(-2, keepdims=True) - out.mean(-2, keepdims=True))
    return out, logdet


def wrap_angle(delta: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi]."""
    return delta - 2.0 * np.pi * jnp.round(delta / (2.0 * np.pi))


def pack_relative(
    coords: jnp.ndarray, ref_coords: jnp.ndarray, zm: ZMatrix
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed internals with the TORSION channel expressed as the wrapped
    displacement from a reference conformation's torsions -- the natural
    conditional target for an internal-coordinate flow (torsion
    displacements are the basin-hopping channel; bonds/angles stay
    absolute). Bijective in ``coords`` for fixed ``ref_coords``; the
    logdet equals pack_internals' (the torsion shift is volume-free)."""
    p, ld = pack_internals(coords, zm)
    p_ref, _ = pack_internals(ref_coords, zm)
    dphi = wrap_angle(p[:, 2] - p_ref[:, 2])
    return p.at[:, 2].set(dphi), ld


def unpack_relative(
    packed: jnp.ndarray, ref_coords: jnp.ndarray, zm: ZMatrix
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p_ref, _ = pack_internals(ref_coords, zm)
    phi = wrap_angle(packed[:, 2] + p_ref[:, 2])
    return unpack_internals(packed.at[:, 2].set(phi), zm, ref_coords)
