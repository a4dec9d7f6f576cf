"""Invertible internal-coordinate recalibration of flow proposals.

Round-4 diagnosis (ROUND4.md item 1): the flagship flow's MH proposals
carry a +30..+40 kT potential-energy excess concentrated in the bond
(+17.5 kT) and angle (+20.8 kT) channels -- the mass-covering NLL
objective leaves the stiff internal-coordinate marginals slightly
over-dispersed, and differentiable acceptance/energy finetunes move that
excess by only ~0.25 kT per 1k steps (runs/runR4_*.log). This module
fixes the *marginals* directly: a fixed, invertible map

    y' = NeRF( affine( zmatrix(y) ) )

that converts a proposal to z-matrix internal coordinates over a BFS
spanning tree of the bond graph, applies a per-coordinate affine
recalibration to bond lengths and bond angles (torsions and the global
frame untouched), and rebuilds Cartesian coordinates. The map has a
closed-form log-Jacobian (the r^2 sin(theta) volume factors of the
spherical parameterization plus the affine scales), so composing it with
the flow keeps the proposal density exact and MH unbiased:

    q'(y | x) = q_flow(Psi^{-1}(y) | x) / |det J_Psi(Psi^{-1}(y))|

The affine parameters are FITTED, not trained: match the per-coordinate
mean/std of model samples to the target statistics (MD data, or a short
on-device MD segment for self-calibration on unseen molecules). This has
no counterpart in the reference (whose proposals go uncorrected into MH,
reference: utils/evaluation_utils.py:626-666); it is cheap insurance the
TPU rebuild can afford because z-matrix walk + NeRF rebuild fuse into the
same XLA program as the flow and the AMBER energy.

Exactness bookkeeping: the map is lower-triangular in BFS order (atom k's
output depends on its own input position plus earlier atoms), so
|det J| = prod over atoms of the per-atom diagonal block:
  s_r * (r'/r)^2                      for the first placed atom (radial)
  s_r * s_th * (r'/r)^2 * sin th'/sin th   for every later atom.
"""
import dataclasses
import pickle
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-24


@dataclasses.dataclass(frozen=True)
class ZMatrix:
    """Static BFS spanning-tree z-matrix over the bond graph.

    order[0] is the root (never moved). order[1] is radial (distance to its
    parent only), order[2] is planar (distance + angle, dihedral plane taken
    from the atom's own geometry), order[k>=3] has full (r, theta, phi)
    references (a, b, c) that appear earlier in the order.
    """

    order: np.ndarray  # [V] int32, BFS atom order
    a: np.ndarray  # [V] int32, ref a (parent) per ordered slot; a[0] = -1
    b: np.ndarray  # [V] int32, angle ref; -1 for slots 0..1
    c: np.ndarray  # [V] int32, dihedral ref; -1 for slots 0..2

    @property
    def num_atoms(self) -> int:
        return int(self.order.shape[0])


@dataclasses.dataclass(frozen=True)
class RecalAffine:
    """Per-coordinate affine edits, aligned with ZMatrix slots.

    r' = r_scale[k] * r + r_shift[k] + r_shift_cond[k] * r_cond[k]
    th' analogous; v' = v_scale * v (global velocity-channel scale).

    The optional ``*_shift_cond`` terms make the shift affine in the
    CONDITIONING state's internals (r_cond = z-matrix internals of the MH
    state the proposal is drawn from): conditional moment matching. The
    round-4 finding that motivates them: the flow's conditionals are sharp
    and track the conditioning state's vibrational coordinates with an
    exaggerated gain, so the correct marginal fix is a contraction AROUND
    THE TRACKING LINE (r' = s r + (beta_d - s beta_m) r_x + ...), not
    around the population mean -- an unconditional contraction moves the
    reverse-density evaluation point off the model's tracking manifold and
    the MH reverse term collapses by hundreds of nats.

    State-dependent bijections keep MH exact: the forward density uses
    Psi_x, the reverse density Psi_y -- both tractable.
    """

    r_scale: np.ndarray  # [V]
    r_shift: np.ndarray  # [V]
    th_scale: np.ndarray  # [V]
    th_shift: np.ndarray  # [V]
    v_scale: float = 1.0
    r_shift_cond: Optional[np.ndarray] = None  # [V]
    th_shift_cond: Optional[np.ndarray] = None  # [V]

    @property
    def conditional(self) -> bool:
        return self.r_shift_cond is not None or self.th_shift_cond is not None

    @staticmethod
    def identity(num_atoms: int) -> "RecalAffine":
        return RecalAffine(
            r_scale=np.ones(num_atoms),
            r_shift=np.zeros(num_atoms),
            th_scale=np.ones(num_atoms),
            th_shift=np.zeros(num_atoms),
            v_scale=1.0,
        )


def build_zmatrix(
    bond_idx: np.ndarray, num_atoms: int, template_coords: Optional[np.ndarray] = None
) -> ZMatrix:
    """BFS spanning tree rooted at the highest-degree atom.

    template_coords (optional [V, 3]) is used only to reject near-collinear
    (a, b, c) dihedral frames when picking references.
    """
    bond_idx = np.asarray(bond_idx)
    adj = [[] for _ in range(num_atoms)]
    for i, j in bond_idx:
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    for nbrs in adj:
        nbrs.sort()
    root = int(np.argmax([len(n) for n in adj]))

    order = [root]
    parent = {root: -1}
    pos = {root: 0}
    queue = [root]
    while queue:
        u = queue.pop(0)
        for v in adj[u]:
            if v not in parent:
                parent[v] = u
                pos[v] = len(order)
                order.append(v)
                queue.append(v)
    if len(order) != num_atoms:
        raise ValueError("bond graph is disconnected; z-matrix needs one component")

    def collinear(ai, bi, ci) -> bool:
        if template_coords is None:
            return False
        u = template_coords[bi] - template_coords[ai]
        w = template_coords[ci] - template_coords[bi]
        cr = np.cross(u, w)
        return float(np.dot(cr, cr)) < 1e-6 * float(np.dot(u, u) * np.dot(w, w) + 1e-30)

    a = np.full(num_atoms, -1, np.int32)
    b = np.full(num_atoms, -1, np.int32)
    c = np.full(num_atoms, -1, np.int32)
    for k, i in enumerate(order):
        if k == 0:
            continue
        pa = parent[i]
        a[k] = pa
        if k == 1:
            continue
        # Angle reference: parent's parent, else the earliest-placed other
        # neighbor of the parent.
        if parent[pa] != -1:
            bb = parent[pa]
        else:
            cands = [n for n in adj[pa] if pos[n] < k and n != i]
            bb = min(cands, key=lambda n: pos[n])
        b[k] = bb
        if k == 2:
            continue
        # Dihedral reference: something earlier, adjacent to b if possible,
        # not {i, a, b}, and not collinear with (a, b).
        cands = [n for n in adj[bb] if pos[n] < k and n not in (i, pa)]
        cands += [n for n in adj[pa] if pos[n] < k and n not in (i, pa, bb)]
        cands += [n for n in order[:k] if n not in (i, pa, bb)]
        cc = next((n for n in cands if not collinear(pa, bb, n)), cands[0])
        c[k] = cc
    return ZMatrix(
        order=np.asarray(order, np.int32), a=a, b=b, c=c
    )


def _unit(v):
    return v / jnp.sqrt((v * v).sum(-1, keepdims=True) + _EPS)


def _norm(v):
    return jnp.sqrt((v * v).sum(-1) + _EPS)


def _edit(val, scale, shift, inverse: bool):
    if inverse:
        return (val - shift) / scale
    return scale * val + shift


def apply_recalibration(
    coords: jnp.ndarray,
    zm: ZMatrix,
    affine: RecalAffine,
    inverse: bool = False,
    cond_internals: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map one conformation [V, 3] through the recalibration (or back).

    ``cond_internals``: z-matrix internals of the CONDITIONING state
    (extract_internals output), required when affine.conditional -- the
    per-coordinate shift becomes shift + shift_cond * cond_internal.

    Returns (coords_out [V, 3], logdet) where logdet is ALWAYS the
    log |det J| of the FORWARD map, evaluated at the unprimed point (the
    input when inverse=False, the output when inverse=True) -- which is the
    quantity the proposal-density correction needs in both directions.
    """
    rs = jnp.asarray(affine.r_scale, coords.dtype)
    rh = jnp.asarray(affine.r_shift, coords.dtype)
    ts = jnp.asarray(affine.th_scale, coords.dtype)
    th_shift = jnp.asarray(affine.th_shift, coords.dtype)
    if affine.conditional:
        if cond_internals is None:
            raise ValueError(
                "affine has conditional shift terms; pass cond_internals="
                "extract_internals(conditioning_state, zm)"
            )
        if affine.r_shift_cond is not None:
            rh = rh + jnp.asarray(affine.r_shift_cond, coords.dtype) * cond_internals["r"]
        if affine.th_shift_cond is not None:
            th_shift = th_shift + (
                jnp.asarray(affine.th_shift_cond, coords.dtype)
                * cond_internals["theta"]
            )

    out = coords
    logdet = jnp.zeros((), coords.dtype)
    theta_min = 1e-4  # keep arccos/sin well-conditioned; bond angles are O(1)

    for k in range(1, zm.num_atoms):
        i = int(zm.order[k])
        ai = int(zm.a[k])
        d = coords[i] - coords[ai]
        r_in = _norm(d)
        # Floor the edited radius: a garbage input far outside the fitted
        # range can drive scale*r + shift negative, which would NaN the
        # log-Jacobian. The floor is only reachable by proposals whose
        # energies are astronomically high (they are rejected regardless),
        # so MH exactness is unaffected in the physical regime.
        r_out = jnp.maximum(_edit(r_in, rs[k], rh[k], inverse), 1e-3)

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
            th_in = jnp.arctan2(pn, du)
            th_in = jnp.clip(th_in, theta_min, np.pi - theta_min)
            th_out = _edit(th_in, ts[k], th_shift[k], inverse)
            th_out = jnp.clip(th_out, theta_min, np.pi - theta_min)
            if k == 2:
                # Dihedral plane from the atom's own geometry: the in-plane
                # unit m follows the atom, so phi == 0 identically and the
                # map stays a bijection (ROUND4 design note).
                m_in = p / pn
                cphi, sphi = 1.0, 0.0
                m_out_frame = m_in
                n_out_frame = jnp.zeros_like(m_in)
            else:
                ci = int(zm.c[k])
                w = coords[ci] - coords[bi]
                m0 = w - (w * u_in).sum(-1) * u_in
                m_in = _unit(m0)
                n_in = jnp.cross(u_in, m_in)
                sphi_r = (p * n_in).sum(-1)
                cphi_r = (p * m_in).sum(-1)
                inv_pn = 1.0 / pn
                cphi, sphi = cphi_r * inv_pn, sphi_r * inv_pn
                # Output frame from the already-rebuilt reference atoms.
                u_out = _unit(out[bi] - out[ai])
                w_out = out[ci] - out[bi]
                m0o = w_out - (w_out * u_out).sum(-1) * u_out
                m_out_frame = _unit(m0o)
                n_out_frame = jnp.cross(u_out, m_out_frame)
            if k == 2:
                u_out = _unit(out[bi] - out[ai])
            dir_out = jnp.cos(th_out) * u_out + jnp.sin(th_out) * (
                cphi * m_out_frame + sphi * n_out_frame
            )
            new_pos = out[ai] + r_out * dir_out

        out = out.at[i].set(new_pos)

        # log|det J_forward| at the unprimed point. Identify primed/unprimed
        # radii by direction: forward maps r_in -> r_out (r_out primed);
        # inverse receives the primed value as input.
        r_primed, r_plain = (r_in, r_out) if inverse else (r_out, r_in)
        logdet = logdet + jnp.log(rs[k]) + 2.0 * (jnp.log(r_primed) - jnp.log(r_plain))
        if k >= 2:
            th_primed, th_plain = (th_in, th_out) if inverse else (th_out, th_in)
            logdet = (
                logdet
                + jnp.log(ts[k])
                + jnp.log(jnp.sin(th_primed))
                - jnp.log(jnp.sin(th_plain))
            )
    # COM preservation: the tree rebuild is anchored at the root, so the
    # raw map shifts the uniform-mean COM by O(edit) -- and the training
    # data has EXACTLY zero COM drift (OpenMM CMMotionRemover), which the
    # flow learns as a near-delta density factor on the COM displacement
    # (round-4 measurement: a 5 pm COM perturbation costs ~200 nats of
    # reverse density). Restoring the input's COM removes that. Because
    # the walk is translation-equivariant, the map is block-diagonal on
    # the (COM, centered) split and this translation leaves the
    # log-Jacobian unchanged.
    out = out + (coords.mean(-2, keepdims=True) - out.mean(-2, keepdims=True))
    return out, logdet


def extract_internals(coords: jnp.ndarray, zm: ZMatrix) -> Dict[str, jnp.ndarray]:
    """Z-matrix internals of one conformation: r [V] (slot-aligned, slot 0
    zero), theta [V] (slots 0..1 zero). Used for fitting the affines."""
    V = zm.num_atoms
    r = jnp.zeros((V,), coords.dtype)
    th = jnp.zeros((V,), coords.dtype)
    for k in range(1, V):
        i, ai = int(zm.order[k]), int(zm.a[k])
        d = coords[i] - coords[ai]
        r = r.at[k].set(_norm(d))
        if k >= 2:
            bi = int(zm.b[k])
            u = _unit(coords[bi] - coords[ai])
            du = (d * u).sum(-1)
            p = d - du * u
            th = th.at[k].set(jnp.arctan2(_norm(p), du))
    return {"r": r, "theta": th}


def fit_recalibration(
    zm: ZMatrix,
    model_coords: np.ndarray,  # [N, V, 3] flow samples
    data_coords: np.ndarray,  # [M, V, 3] target-distributed frames
    model_velocs: Optional[np.ndarray] = None,  # [N, V, 3]
    data_velocs: Optional[np.ndarray] = None,
    scale_clip: Tuple[float, float] = (0.25, 4.0),
    calibrate_angles: bool = True,
    scale_power: float = 1.0,
) -> RecalAffine:
    """Per-coordinate moment matching: affine such that the model-sample
    marginal mean/std of each z-matrix bond (and angle) maps onto the
    target statistics.

    ``scale_power`` interpolates the variance correction: 1.0 = full
    moment matching, 0.0 = SHIFT-ONLY (fix the systematic mean bias,
    leave deviations untouched). Shift-only is the right mode when the
    flow's conditionals are sharp and track the conditioning state's
    vibrational phase (round-4 finding: full scaling moves the reverse
    density evaluation point ~5 conditional-sigma off the model's
    tracking manifold and the MH reverse term collapses by hundreds of
    nats, while the mean bias is state-independent and safe to remove)."""
    ex = jax.jit(jax.vmap(lambda c: extract_internals(c, zm)))
    mi = jax.device_get(ex(jnp.asarray(model_coords)))
    di = jax.device_get(ex(jnp.asarray(data_coords)))

    def affine_1d(m, d):
        ms, ds = m.std(0) + 1e-12, d.std(0) + 1e-12
        scale = np.clip(ds / ms, *scale_clip) ** scale_power
        shift = d.mean(0) - scale * m.mean(0)
        return scale, shift

    r_scale, r_shift = affine_1d(mi["r"], di["r"])
    r_scale[0], r_shift[0] = 1.0, 0.0
    if calibrate_angles:
        th_scale, th_shift = affine_1d(mi["theta"], di["theta"])
        th_scale[:2], th_shift[:2] = 1.0, 0.0
    else:
        th_scale, th_shift = np.ones_like(r_scale), np.zeros_like(r_shift)

    v_scale = 1.0
    if model_velocs is not None and data_velocs is not None:
        v_scale = float(
            (np.asarray(data_velocs).std() + 1e-12)
            / (np.asarray(model_velocs).std() + 1e-12)
        )
    return RecalAffine(
        r_scale=r_scale,
        r_shift=r_shift,
        th_scale=th_scale,
        th_shift=th_shift,
        v_scale=v_scale,
    )


def fit_conditional_recalibration(
    zm: ZMatrix,
    model_cond_coords: np.ndarray,  # [N, V, 3] conditioning state per sample
    model_coords: np.ndarray,  # [N, V, 3] flow sample drawn at that state
    data_x_coords: np.ndarray,  # [M, V, 3] MD pair sources
    data_y_coords: np.ndarray,  # [M, V, 3] MD pair targets (one step width on)
    model_velocs: Optional[np.ndarray] = None,
    data_velocs: Optional[np.ndarray] = None,
    scale_clip: Tuple[float, float] = (0.25, 4.0),
    calibrate_angles: bool = True,
    scale_power: float = 1.0,
) -> RecalAffine:
    """Conditional moment matching: per z-matrix coordinate, regress the
    proposal internal on the conditioning internal (model: beta_m, a_m,
    resid_m; data pairs: beta_d, a_d, resid_d) and build the map

        r' = s r + B r_cond + A,
        s = (resid_d / resid_m) ** scale_power,
        B = beta_d - s beta_m,   A = a_d - s a_m,

    so the composed proposal's conditional slope/intercept/residual match
    the data's. Unlike the unconditional fit, the contraction happens
    around the model's tracking line, so the reverse-density evaluation
    point stays on the model's conditional manifold (see RecalAffine)."""
    ex = jax.jit(jax.vmap(lambda c: extract_internals(c, zm)))
    mc = jax.device_get(ex(jnp.asarray(model_cond_coords)))
    mi = jax.device_get(ex(jnp.asarray(model_coords)))
    dx = jax.device_get(ex(jnp.asarray(data_x_coords)))
    dy = jax.device_get(ex(jnp.asarray(data_y_coords)))

    def cond_affine_1d(c_m, y_m, c_d, y_d):
        def reg(c, y):
            cm, ym = c.mean(0), y.mean(0)
            cv = ((c - cm) ** 2).mean(0) + 1e-16
            beta = ((c - cm) * (y - ym)).mean(0) / cv
            a = ym - beta * cm
            resid = (y - beta * c - a).std(0) + 1e-12
            return beta, a, resid

        b_m, a_m, r_m = reg(c_m, y_m)
        b_d, a_d, r_d = reg(c_d, y_d)
        s = np.clip(r_d / r_m, *scale_clip) ** scale_power
        B = b_d - s * b_m
        A = a_d - s * a_m
        return s, A, B

    r_scale, r_shift, r_shift_cond = cond_affine_1d(
        mc["r"], mi["r"], dx["r"], dy["r"]
    )
    r_scale[0], r_shift[0], r_shift_cond[0] = 1.0, 0.0, 0.0
    if calibrate_angles:
        th_scale, th_shift, th_shift_cond = cond_affine_1d(
            mc["theta"], mi["theta"], dx["theta"], dy["theta"]
        )
        th_scale[:2], th_shift[:2], th_shift_cond[:2] = 1.0, 0.0, 0.0
    else:
        th_scale = np.ones_like(r_scale)
        th_shift = np.zeros_like(r_shift)
        th_shift_cond = np.zeros_like(r_shift)

    v_scale = 1.0
    if model_velocs is not None and data_velocs is not None:
        v_scale = float(
            (np.asarray(data_velocs).std() + 1e-12)
            / (np.asarray(model_velocs).std() + 1e-12)
        )
    return RecalAffine(
        r_scale=r_scale,
        r_shift=r_shift,
        th_scale=th_scale,
        th_shift=th_shift,
        v_scale=v_scale,
        r_shift_cond=r_shift_cond,
        th_shift_cond=th_shift_cond,
    )


def wrap_proposal(propose_fn, reverse_logp_fn, zm: ZMatrix, affine: RecalAffine):
    """Compose a (propose_fn, reverse_logp_fn) pair (sampling/mh.py
    conventions, unpadded [V, 3] states) with the recalibration, keeping the
    MH kernel exact: the proposal becomes y = Psi_x(y_flow), and both density
    directions use the exact pushforward
    log q'(y|x) = log q_flow(Psi_x^{-1}(y)|x) - log|det J_Psi_x(...)|.

    For a conditional affine, the forward map conditions on x and the
    reverse density on each proposal y_k (Psi_y) -- a state-dependent
    bijection is still an ordinary Markov kernel with tractable density.
    NOTE: the reverse path then hands reverse_logp_fn a PER-PROPOSAL
    x batch [K, V, 3]; make_flow_proposal's reverse supports both shapes."""
    v_scale = jnp.asarray(affine.v_scale, jnp.float32)
    n_dof = 3.0 * zm.num_atoms

    def propose_recal(params, rng, x_coords, x_velocs, K):
        yc0, yv0, logp = propose_fn(params, rng, x_coords, x_velocs, K)
        cond = extract_internals(x_coords, zm) if affine.conditional else None
        yc, ld = jax.vmap(
            lambda c: apply_recalibration(c, zm, affine, cond_internals=cond)
        )(yc0)
        yv = v_scale * yv0
        return yc, yv, logp - ld - n_dof * jnp.log(v_scale)

    def reverse_recal(params, y_coords, y_velocs, x_coords, x_velocs):
        # log q'(x, xv | y, yv) = log q_flow(Psi_y^{-1}(x), xv/s_v | y, yv)
        #                         - log|det J_Psi_y(Psi_y^{-1}(x))| - 3V log s_v
        if affine.conditional:
            conds = jax.vmap(lambda y: extract_internals(y, zm))(y_coords)
            x0, ld = jax.vmap(
                lambda cd_r, cd_t: apply_recalibration(
                    x_coords, zm, affine, inverse=True,
                    cond_internals={"r": cd_r, "theta": cd_t},
                )
            )(conds["r"], conds["theta"])  # x0: [K, V, 3], ld: [K]
        else:
            x0, ld = apply_recalibration(x_coords, zm, affine, inverse=True)
        lp = reverse_logp_fn(params, y_coords, y_velocs, x0, x_velocs / v_scale)
        return lp - ld - n_dof * jnp.log(v_scale)

    return propose_recal, reverse_recal


def save_recalibration(path: str, zm: ZMatrix, affine: RecalAffine) -> None:
    with open(path, "wb") as f:
        pickle.dump(
            {
                "zmatrix": dataclasses.asdict(zm),
                "affine": dataclasses.asdict(affine),
            },
            f,
        )


def load_recalibration(path: str) -> Tuple[ZMatrix, RecalAffine]:
    with open(path, "rb") as f:
        d = pickle.load(f)
    return ZMatrix(**d["zmatrix"]), RecalAffine(**d["affine"])
