"""Involutive stiff-channel swap proposal: exact MH with the flow's stiff
internal coordinates replaced by data-calibrated AR(1) draws.

Round-4 finding chain (ROUND4.md item 1): the flagship flow's proposals
carry a +25..40 kT potential excess in bond/angle channels; the flow's
conditionals are SHARP and track the conditioning state's vibrational
internals, so any deterministic recalibration map (models/recalibration.py)
that moves samples toward the target pays more reverse-density than it
gains in energy (measured: dlogp +46..+650 vs dE -22). The fix has to
leave both flow-density evaluations ON the model's tracking manifold while
the proposal's stiff channels follow the DATA's transition statistics.

Construction (involutive MCMC with auxiliary variables): extend the state
with iid N(0,1) auxiliaries u, v (one per stiff coordinate, refreshed every
iteration). One proposal:

    y0, yv0 ~ flow(. | x, xv)                    (the flow draw)
    s_y  = a_d + b_d s(x) + r_d u                 (data AR(1) stiff draw)
    y    = y0 with stiff internals <- s_y         (the proposal)
    yhat0 = x with stiff <- a_m + b_m s(y) + r_m v  (reverse flow point,
                                                   on the model's tracking
                                                   line about y)
    u'   = (s(x) - a_d - b_d s(y)) / r_d          (stores x's stiff)
    v'   = (s(y0) - a_m - b_m s(x)) / r_m         (stores the flow's stiff)

The map (x, y0, u, v) -> (y, yhat0, u', v') is an exact involution (apply
it twice and everything returns; verified in tests), its internal-space
Jacobian is 1, and the only Jacobian contribution is the z-matrix measure
factor r^2 sin(theta) of the two rebuilds. Acceptance:

    log alpha = -(dE + dKE)
                + log q_flow(yhat0, xv | y, yv) - log q_flow(y0, yv0 | x, xv)
                + sum log phi(u') + log phi(v') - log phi(u) - log phi(v)
                + log|J|

(a_d, b_d, r_d) come from MD pairs at the step width; (a_m, b_m, r_m) from
regressing flow-sample internals on conditioning internals. Both evaluation
points are typical under the flow, the proposal's stiff statistics are the
data's, and the torsion channels -- where the flow's basin-hopping value
lives -- stay untouched. No counterpart in the reference (its proposals go
raw into MH, reference: utils/evaluation_utils.py:626-666).
"""
import dataclasses
import pickle
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.models.recalibration import (
    ZMatrix,
    _norm,
    _unit,
    extract_internals,
)

_LOG_2PI = float(np.log(2.0 * np.pi))


@dataclasses.dataclass(frozen=True)
class ChannelAR:
    """Per-z-matrix-coordinate AR(1) statistics, slot-aligned (slot 0 and,
    for angles, slot 1 are inert). `*_d` = data pairs at the step width,
    `*_m` = model samples regressed on their conditioning state."""

    r_a_d: np.ndarray
    r_b_d: np.ndarray
    r_s_d: np.ndarray  # residual std
    r_a_m: np.ndarray
    r_b_m: np.ndarray
    r_s_m: np.ndarray
    th_a_d: np.ndarray
    th_b_d: np.ndarray
    th_s_d: np.ndarray
    th_a_m: np.ndarray
    th_b_m: np.ndarray
    th_s_m: np.ndarray
    swap_angles: bool = True


def _reg(c: np.ndarray, y: np.ndarray):
    cm, ym = c.mean(0), y.mean(0)
    cv = ((c - cm) ** 2).mean(0) + 1e-16
    beta = ((c - cm) * (y - ym)).mean(0) / cv
    a = ym - beta * cm
    resid = (y - beta * c - a).std(0) + 1e-9
    return a, beta, resid


def fit_channel_ar(
    zm: ZMatrix,
    model_cond_coords: np.ndarray,  # [N, V, 3]
    model_coords: np.ndarray,  # [N, V, 3]
    data_x_coords: np.ndarray,  # [M, V, 3]
    data_y_coords: np.ndarray,  # [M, V, 3]
    swap_angles: bool = True,
) -> ChannelAR:
    ex = jax.jit(jax.vmap(lambda c: extract_internals(c, zm)))
    mc = jax.device_get(ex(jnp.asarray(model_cond_coords)))
    mi = jax.device_get(ex(jnp.asarray(model_coords)))
    dx = jax.device_get(ex(jnp.asarray(data_x_coords)))
    dy = jax.device_get(ex(jnp.asarray(data_y_coords)))

    r_a_d, r_b_d, r_s_d = _reg(dx["r"], dy["r"])
    r_a_m, r_b_m, r_s_m = _reg(mc["r"], mi["r"])
    th_a_d, th_b_d, th_s_d = _reg(dx["theta"], dy["theta"])
    th_a_m, th_b_m, th_s_m = _reg(mc["theta"], mi["theta"])

    def inert(arrs, n):
        for a in arrs:
            a[:n] = 0.0
        return arrs

    # Slot 0 has no bond; slots 0-1 no angle. Mark inert by zero residual
    # sentinel handled in the kernel via the active masks below.
    inert([r_a_d, r_b_d, r_a_m, r_b_m], 1)
    inert([th_a_d, th_b_d, th_a_m, th_b_m], 2)
    r_s_d[:1] = r_s_m[:1] = 1.0
    th_s_d[:2] = th_s_m[:2] = 1.0
    return ChannelAR(
        r_a_d=r_a_d, r_b_d=r_b_d, r_s_d=r_s_d,
        r_a_m=r_a_m, r_b_m=r_b_m, r_s_m=r_s_m,
        th_a_d=th_a_d, th_b_d=th_b_d, th_s_d=th_s_d,
        th_a_m=th_a_m, th_b_m=th_b_m, th_s_m=th_s_m,
        swap_angles=swap_angles,
    )


def replace_internals(
    coords: jnp.ndarray,
    zm: ZMatrix,
    new_r: jnp.ndarray,  # [V] slot-aligned bond lengths (slot 0 ignored)
    new_th: Optional[jnp.ndarray],  # [V] slot-aligned angles or None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rebuild the conformation with the given stiff internals, keeping
    every dihedral (and the COM) fixed. Returns (coords_out, logdet) with
    logdet = sum 2 log(r_new/r_old) + log(sin th_new / sin th_old) -- the
    z-matrix measure factor of the rebuild."""
    out = coords
    logdet = jnp.zeros((), coords.dtype)
    theta_min = 1e-4

    for k in range(1, zm.num_atoms):
        i = int(zm.order[k])
        ai = int(zm.a[k])
        d = coords[i] - coords[ai]
        r_in = _norm(d)
        r_out = jnp.maximum(new_r[k], 1e-3)

        if k == 1:
            u = d / r_in
            new_pos = out[ai] + r_out * u
            th_in = th_out = None
        else:
            bi = int(zm.b[k])
            u_in = _unit(coords[bi] - coords[ai])
            du = (d * u_in).sum(-1)
            p = d - du * u_in
            pn = _norm(p)
            th_in = jnp.clip(jnp.arctan2(pn, du), theta_min, np.pi - theta_min)
            th_out = (
                jnp.clip(new_th[k], theta_min, np.pi - theta_min)
                if new_th is not None
                else th_in
            )
            if k == 2:
                m_in = p / pn
                cphi, sphi = 1.0, 0.0
                u_out = _unit(out[bi] - out[ai])
                m_out_frame, n_out_frame = m_in, jnp.zeros_like(m_in)
            else:
                ci = int(zm.c[k])
                w = coords[ci] - coords[bi]
                m0 = w - (w * u_in).sum(-1) * u_in
                m_in = _unit(m0)
                n_in = jnp.cross(u_in, m_in)
                inv_pn = 1.0 / pn
                cphi = (p * m_in).sum(-1) * inv_pn
                sphi = (p * n_in).sum(-1) * inv_pn
                u_out = _unit(out[bi] - out[ai])
                w_out = out[ci] - out[bi]
                m0o = w_out - (w_out * u_out).sum(-1) * u_out
                m_out_frame = _unit(m0o)
                n_out_frame = jnp.cross(u_out, m_out_frame)
            dir_out = jnp.cos(th_out) * u_out + jnp.sin(th_out) * (
                cphi * m_out_frame + sphi * n_out_frame
            )
            new_pos = out[ai] + r_out * dir_out

        out = out.at[i].set(new_pos)
        logdet = logdet + 2.0 * (jnp.log(r_out) - jnp.log(r_in))
        if k >= 2:
            logdet = logdet + jnp.log(jnp.sin(th_out)) - jnp.log(jnp.sin(th_in))

    # COM-preserving translation (det-neutral; see recalibration.py).
    out = out + (coords.mean(-2, keepdims=True) - out.mean(-2, keepdims=True))
    return out, logdet


def _phi(z):
    """Standard-normal log-density summed over active slots."""
    return -0.5 * (z**2 + _LOG_2PI)


def make_swap_proposal(propose_fn, reverse_logp_fn, zm: ZMatrix, ar: ChannelAR):
    """Compose (propose_fn, reverse_logp_fn) with the involutive stiff-
    channel swap. Returns a pair with the SAME mh.py interface; the entire
    involution bookkeeping folds into the returned log-densities:

        p_xy = log q_flow(y0|x) + sum phi(u) + phi(v)
               - log q_flow(yhat0|y) - sum phi(v') - log|J|
        p_yx = sum phi(u')            (recomputable from (x, y) alone)

    so mh_segment's exponent dE + dKE + p_xy - p_yx equals -log alpha of
    the involutive kernel exactly."""
    V = zm.num_atoms
    r_mask = np.zeros(V); r_mask[1:] = 1.0
    th_mask = np.zeros(V)
    if ar.swap_angles:
        th_mask[2:] = 1.0
    r_mask = jnp.asarray(r_mask, jnp.float32)
    th_mask = jnp.asarray(th_mask, jnp.float32)

    A = {k: jnp.asarray(getattr(ar, k), jnp.float32) for k in (
        "r_a_d", "r_b_d", "r_s_d", "r_a_m", "r_b_m", "r_s_m",
        "th_a_d", "th_b_d", "th_s_d", "th_a_m", "th_b_m", "th_s_m",
    )}

    def u_prime(s_x, s_y):
        ur = (s_x["r"] - A["r_a_d"] - A["r_b_d"] * s_y["r"]) / A["r_s_d"]
        ut = (s_x["theta"] - A["th_a_d"] - A["th_b_d"] * s_y["theta"]) / A["th_s_d"]
        return (_phi(ur) * r_mask).sum() + (_phi(ut) * th_mask).sum()

    def propose_swap(params, rng, x_coords, x_velocs, K):
        k_flow, k_u, k_v = jax.random.split(rng, 3)
        y0, yv0, lp_fwd = propose_fn(params, k_flow, x_coords, x_velocs, K)
        s_x = extract_internals(x_coords, zm)
        u = jax.random.normal(k_u, (K, 2, V))
        v = jax.random.normal(k_v, (K, 2, V))

        def one(y0_k, u_k, v_k):
            s_y0 = extract_internals(y0_k, zm)
            # data AR(1) draw for the proposal's stiff internals
            ry = A["r_a_d"] + A["r_b_d"] * s_x["r"] + A["r_s_d"] * u_k[0]
            ty = A["th_a_d"] + A["th_b_d"] * s_x["theta"] + A["th_s_d"] * u_k[1]
            ry = jnp.where(r_mask > 0, ry, s_y0["r"])
            ty = jnp.where(th_mask > 0, ty, s_y0["theta"])
            y_k, ld_y = replace_internals(y0_k, zm, ry, ty)
            s_y = {"r": ry, "theta": ty}
            # reverse flow point: x with stiff on the MODEL's tracking line
            # about y
            rx = A["r_a_m"] + A["r_b_m"] * s_y["r"] + A["r_s_m"] * v_k[0]
            tx = A["th_a_m"] + A["th_b_m"] * s_y["theta"] + A["th_s_m"] * v_k[1]
            rx = jnp.where(r_mask > 0, rx, s_x["r"])
            tx = jnp.where(th_mask > 0, tx, s_x["theta"])
            yhat0_k, ld_xhat = replace_internals(x_coords, zm, rx, tx)
            # v' stores the flow's stiff values, model-standardized about x
            vpr = (s_y0["r"] - A["r_a_m"] - A["r_b_m"] * s_x["r"]) / A["r_s_m"]
            vpt = (
                s_y0["theta"] - A["th_a_m"] - A["th_b_m"] * s_x["theta"]
            ) / A["th_s_m"]
            aux = (
                (_phi(u_k[0]) * r_mask).sum()
                + (_phi(u_k[1]) * th_mask).sum()
                + (_phi(v_k[0]) * r_mask).sum()
                + (_phi(v_k[1]) * th_mask).sum()
                - (_phi(vpr) * r_mask).sum()
                - (_phi(vpt) * th_mask).sum()
            )
            return y_k, yhat0_k, aux - ld_y - ld_xhat

        y, yhat0, extra = jax.vmap(one)(y0, u, v)
        # log q_flow(yhat0, xv | y, yv): the reverse flow density, evaluated
        # per proposal (reverse_logp_fn supports a per-proposal x batch).
        lp_rev_flow = reverse_logp_fn(params, y, yv0, yhat0, x_velocs)
        return y, yv0, lp_fwd + extra - lp_rev_flow

    def reverse_swap(params, y_coords, y_velocs, x_coords, x_velocs):
        s_x = extract_internals(x_coords, zm)
        s_ys = jax.vmap(lambda y: extract_internals(y, zm))(y_coords)
        return jax.vmap(
            lambda r, t: u_prime(s_x, {"r": r, "theta": t})
        )(s_ys["r"], s_ys["theta"])

    return propose_swap, reverse_swap


def save_channel_ar(path: str, zm: ZMatrix, ar: ChannelAR) -> None:
    with open(path, "wb") as f:
        pickle.dump(
            {"zmatrix": dataclasses.asdict(zm), "ar": dataclasses.asdict(ar)}, f
        )


def load_channel_ar(path: str) -> Tuple[ZMatrix, ChannelAR]:
    with open(path, "rb") as f:
        d = pickle.load(f)
    return ZMatrix(**d["zmatrix"]), ChannelAR(**d["ar"])


@dataclasses.dataclass(frozen=True)
class ChannelMVN:
    """Joint-Gaussian stiff-channel statistics over the stacked vector
    s = [r[1:], theta[2:]] (dim m = 2V-3): s_next ~ N(A^T s_prev + b, L L^T).

    The per-coordinate ChannelAR cannot represent the flow's cross-
    coordinate conditional correlations (round-4 measurement: independently
    redrawing angle internals of the conditioning state costs ~200 nats of
    flow density; bonds ~60). The multivariate form keeps both the data
    draw (x -> y stiff) and the model-tracking draw (y -> yhat0 stiff) in
    the respective JOINT conditional laws, so the involutive swap's density
    terms stay typical. |det| of the internal linear block is still exactly
    1 (block-triangular elimination, same algebra as the scalar case)."""

    A_d: np.ndarray  # [m, m]
    b_d: np.ndarray  # [m]
    L_d: np.ndarray  # [m, m] lower cholesky of the data residual covariance
    A_m: np.ndarray
    b_m: np.ndarray
    L_m: np.ndarray


def _stack_stiff(s, V):
    return jnp.concatenate([s["r"][..., 1:], s["theta"][..., 2:]], axis=-1)


def _unstack_stiff(vec, s_src, V):
    """Slot-aligned (new_r, new_th) arrays from a stacked stiff vector,
    inert slots taken from s_src."""
    new_r = s_src["r"].at[1:].set(vec[: V - 1])
    new_th = s_src["theta"].at[2:].set(vec[V - 1:])
    return new_r, new_th


def _mvn_reg(C: np.ndarray, Y: np.ndarray, ridge: float):
    Cm, Ym = C.mean(0), Y.mean(0)
    Cc, Yc = C - Cm, Y - Ym
    G = Cc.T @ Cc / len(C)
    lam = ridge * np.trace(G) / G.shape[0]
    A = np.linalg.solve(G + lam * np.eye(G.shape[0]), Cc.T @ Yc / len(C))
    b = Ym - Cm @ A
    R = Yc - Cc @ A
    S = R.T @ R / len(R)
    S = S + 1e-4 * np.trace(S) / S.shape[0] * np.eye(S.shape[0])
    return A, b, np.linalg.cholesky(S)


def fit_channel_mvn(
    zm: ZMatrix,
    model_cond_coords: np.ndarray,
    model_coords: np.ndarray,
    data_x_coords: np.ndarray,
    data_y_coords: np.ndarray,
    ridge: float = 0.05,
) -> ChannelMVN:
    V = zm.num_atoms
    ex = jax.jit(jax.vmap(lambda c: extract_internals(c, zm)))

    def stiff(arr):
        s = jax.device_get(ex(jnp.asarray(arr)))
        return np.concatenate([s["r"][:, 1:], s["theta"][:, 2:]], axis=1)

    A_m, b_m, L_m = _mvn_reg(stiff(model_cond_coords), stiff(model_coords), ridge)
    A_d, b_d, L_d = _mvn_reg(stiff(data_x_coords), stiff(data_y_coords), ridge)
    return ChannelMVN(A_d=A_d, b_d=b_d, L_d=L_d, A_m=A_m, b_m=b_m, L_m=L_m)


def make_swap_proposal_mvn(propose_fn, reverse_logp_fn, zm: ZMatrix, mv: ChannelMVN):
    """Multivariate involutive stiff-channel swap; same interface and
    acceptance folding as make_swap_proposal."""
    import jax.scipy.linalg as jsl

    V = zm.num_atoms
    m = 2 * V - 3
    A_d = jnp.asarray(mv.A_d, jnp.float32)
    b_d = jnp.asarray(mv.b_d, jnp.float32)
    L_d = jnp.asarray(mv.L_d, jnp.float32)
    A_m = jnp.asarray(mv.A_m, jnp.float32)
    b_m = jnp.asarray(mv.b_m, jnp.float32)
    L_m = jnp.asarray(mv.L_m, jnp.float32)

    def solve_L(L, r):
        return jsl.solve_triangular(L, r, lower=True)

    def u_prime_vec(s_x_vec, s_y_vec):
        return solve_L(L_d, s_x_vec - b_d - s_y_vec @ A_d)

    def propose_swap(params, rng, x_coords, x_velocs, K):
        k_flow, k_u, k_v = jax.random.split(rng, 3)
        y0, yv0, lp_fwd = propose_fn(params, k_flow, x_coords, x_velocs, K)
        s_x = extract_internals(x_coords, zm)
        s_x_vec = _stack_stiff(s_x, V)
        u = jax.random.normal(k_u, (K, m))
        v = jax.random.normal(k_v, (K, m))

        def one(y0_k, u_k, v_k):
            s_y0 = extract_internals(y0_k, zm)
            s_y0_vec = _stack_stiff(s_y0, V)
            s_y_vec = b_d + s_x_vec @ A_d + L_d @ u_k
            ry, ty = _unstack_stiff(s_y_vec, s_y0, V)
            y_k, ld_y = replace_internals(y0_k, zm, ry, ty)
            s_h_vec = b_m + s_y_vec @ A_m + L_m @ v_k
            rx, tx = _unstack_stiff(s_h_vec, s_x, V)
            yhat0_k, ld_xh = replace_internals(x_coords, zm, rx, tx)
            vp = solve_L(L_m, s_y0_vec - b_m - s_x_vec @ A_m)
            aux = (
                _phi(u_k).sum() + _phi(v_k).sum() - _phi(vp).sum()
            )
            return y_k, yhat0_k, aux - ld_y - ld_xh

        y, yhat0, extra = jax.vmap(one)(y0, u, v)
        lp_rev_flow = reverse_logp_fn(params, y, yv0, yhat0, x_velocs)
        return y, yv0, lp_fwd + extra - lp_rev_flow

    def reverse_swap(params, y_coords, y_velocs, x_coords, x_velocs):
        s_x_vec = _stack_stiff(extract_internals(x_coords, zm), V)
        s_ys = jax.vmap(lambda y: _stack_stiff(extract_internals(y, zm), V))(
            y_coords
        )
        return jax.vmap(lambda sy: _phi(u_prime_vec(s_x_vec, sy)).sum())(s_ys)

    return propose_swap, reverse_swap


def save_channel_mvn(path: str, zm: ZMatrix, mv: ChannelMVN) -> None:
    with open(path, "wb") as f:
        pickle.dump(
            {"zmatrix": dataclasses.asdict(zm), "mvn": dataclasses.asdict(mv)}, f
        )


def load_channel_mvn(path: str) -> Tuple[ZMatrix, "ChannelMVN"]:
    with open(path, "rb") as f:
        d = pickle.load(f)
    return ZMatrix(**d["zmatrix"]), ChannelMVN(**d["mvn"])
