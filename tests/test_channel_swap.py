"""Involutive stiff-channel swap proposal (models/channel_swap.py):
involution property, measure-factor bookkeeping, and MH exactness +
acceptance gain on the tracking-proposal toy that defeats deterministic
recalibration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.models.channel_swap import (
    ChannelAR,
    fit_channel_ar,
    make_swap_proposal,
    replace_internals,
)
from timewarp_tpu.models.recalibration import (
    RecalAffine,
    apply_recalibration,
    build_zmatrix,
    extract_internals,
)

V = 4
BOND_IDX = np.array([[0, 1], [1, 2], [2, 3]])
R0 = 0.15
SIG = 0.01
TEMPLATE = np.array(
    [[0.0, 0, 0], [R0, 0, 0], [R0, R0, 0], [R0, R0, R0]], np.float32
)


@pytest.fixture(scope="module")
def zm():
    return build_zmatrix(BOND_IDX, V, TEMPLATE)


def test_replace_internals_round_trip(zm):
    """Setting internals to the extracted values is the identity; setting
    new values then the old values returns the original conformation, and
    the two logdets cancel."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(TEMPLATE + 0.01 * rng.standard_normal((V, 3)), jnp.float32)
    s = extract_internals(x, zm)
    same, ld0 = replace_internals(x, zm, s["r"], s["theta"])
    np.testing.assert_allclose(np.asarray(same), np.asarray(x), atol=1e-5)
    assert abs(float(ld0)) < 1e-4

    new_r = s["r"] + 0.01 * jnp.asarray(rng.standard_normal(V), jnp.float32)
    new_th = s["theta"] + 0.05 * jnp.asarray(rng.standard_normal(V), jnp.float32)
    y, ld1 = replace_internals(x, zm, new_r, new_th)
    # torsions and COM preserved
    np.testing.assert_allclose(
        np.asarray(y.mean(0)), np.asarray(x.mean(0)), atol=1e-5
    )
    sy = extract_internals(y, zm)
    np.testing.assert_allclose(np.asarray(sy["r"])[1:], np.asarray(new_r)[1:], atol=1e-5)
    back, ld2 = replace_internals(y, zm, s["r"], s["theta"])
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=2e-5)
    np.testing.assert_allclose(float(ld1), -float(ld2), atol=1e-3)


def _toy_ar(zm, rng):
    """Arbitrary (well-conditioned) AR stats for the involution test."""
    def arr(lo, hi):
        return rng.uniform(lo, hi, V)

    ar = ChannelAR(
        r_a_d=0.01 * arr(-1, 1), r_b_d=arr(0.2, 0.6), r_s_d=arr(0.003, 0.008),
        r_a_m=0.01 * arr(-1, 1), r_b_m=arr(0.5, 1.2), r_s_m=arr(0.001, 0.004),
        th_a_d=0.05 * arr(-1, 1), th_b_d=arr(0.2, 0.6), th_s_d=arr(0.01, 0.04),
        th_a_m=0.05 * arr(-1, 1), th_b_m=arr(0.5, 1.2), th_s_m=arr(0.005, 0.02),
    )
    return ar


def test_involution_property(zm):
    """The swap map (x, y0, u, v) -> (y, yhat0, u', v') applied twice is
    the identity, and the two measure logdets cancel pairwise."""
    rng = np.random.default_rng(1)
    ar = _toy_ar(zm, rng)
    A = {k: jnp.asarray(getattr(ar, k), jnp.float32) for k in (
        "r_a_d", "r_b_d", "r_s_d", "r_a_m", "r_b_m", "r_s_m",
        "th_a_d", "th_b_d", "th_s_d", "th_a_m", "th_b_m", "th_s_m")}
    r_mask = np.zeros(V); r_mask[1:] = 1
    th_mask = np.zeros(V); th_mask[2:] = 1
    r_mask, th_mask = jnp.asarray(r_mask, jnp.float32), jnp.asarray(th_mask, jnp.float32)

    def step(x, y0, u, v):
        s_x, s_y0 = extract_internals(x, zm), extract_internals(y0, zm)
        ry = A["r_a_d"] + A["r_b_d"] * s_x["r"] + A["r_s_d"] * u[0]
        ty = A["th_a_d"] + A["th_b_d"] * s_x["theta"] + A["th_s_d"] * u[1]
        ry = jnp.where(r_mask > 0, ry, s_y0["r"])
        ty = jnp.where(th_mask > 0, ty, s_y0["theta"])
        y, ld_y = replace_internals(y0, zm, ry, ty)
        rx = A["r_a_m"] + A["r_b_m"] * ry + A["r_s_m"] * v[0]
        tx = A["th_a_m"] + A["th_b_m"] * ty + A["th_s_m"] * v[1]
        rx = jnp.where(r_mask > 0, rx, s_x["r"])
        tx = jnp.where(th_mask > 0, tx, s_x["theta"])
        yhat0, ld_x = replace_internals(x, zm, rx, tx)
        up = jnp.stack([
            (s_x["r"] - A["r_a_d"] - A["r_b_d"] * ry) / A["r_s_d"],
            (s_x["theta"] - A["th_a_d"] - A["th_b_d"] * ty) / A["th_s_d"],
        ])
        vp = jnp.stack([
            (s_y0["r"] - A["r_a_m"] - A["r_b_m"] * s_x["r"]) / A["r_s_m"],
            (s_y0["theta"] - A["th_a_m"] - A["th_b_m"] * s_x["theta"]) / A["th_s_m"],
        ])
        return y, yhat0, up, vp, float(ld_y + ld_x)

    x = jnp.asarray(TEMPLATE + 0.01 * rng.standard_normal((V, 3)), jnp.float32)
    y0 = jnp.asarray(TEMPLATE + 0.01 * rng.standard_normal((V, 3)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((2, V)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, V)), jnp.float32)

    y, yhat0, up, vp, ld1 = step(x, y0, u, v)
    x2, y02, u2, v2, ld2 = step(y, yhat0, up, vp)

    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=3e-5)
    np.testing.assert_allclose(np.asarray(y02), np.asarray(y0), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(u2)[:, 1:] * np.asarray([np.ones(V - 1), (np.arange(1, V) >= 2)]),
        np.asarray(u)[:, 1:] * np.asarray([np.ones(V - 1), (np.arange(1, V) >= 2)]),
        atol=2e-3,
    )
    np.testing.assert_allclose(ld1, -ld2, atol=1e-3)


def test_mh_exact_with_channel_swap():
    """Same tracking toy that defeats deterministic recalibration: the
    proposal's stiff internals track the conditioning state with the wrong
    gain and a sharp residual. The swap kernel must accept at a high rate
    and sample the correct marginals."""
    from timewarp_tpu.sampling.mh import MHConfig, MHState, mh_segment

    zm = build_zmatrix(BOND_IDX, V, TEMPLATE)
    ti = jax.tree_util.tree_map(
        np.asarray, extract_internals(jnp.asarray(TEMPLATE), zm)
    )

    # Internal-separable target (the real stiff-energy structure: bond and
    # angle terms are per-internal-coordinate); torsions and the global
    # frame are free.
    SR, ST = 0.014, 0.10
    r_mask_np = np.zeros(V); r_mask_np[1:] = 1
    th_mask_np = np.zeros(V); th_mask_np[2:] = 1

    def energy_one(c):
        si = extract_internals(c, zm)
        er = (0.5 * ((si["r"] - ti["r"]) / SR) ** 2 * r_mask_np).sum()
        et = (0.5 * ((si["theta"] - ti["theta"]) / ST) ** 2 * th_mask_np).sum()
        return er + et

    def energy_fn(coords):
        if coords.ndim == 2:
            return energy_one(coords)
        return jax.vmap(energy_one)(coords)

    # Exaggerated tracking gain (the real flagship's structure: marginal
    # std ~1.35x the target, conditional sharp): defeats the plain kernel.
    s0, g = 0.35, 1.3
    distort = RecalAffine(
        r_scale=np.full(V, s0),
        r_shift=(1.0 - s0 - g) * ti["r"],
        th_scale=np.full(V, s0),
        th_shift=(1.0 - s0 - g) * ti["theta"],
        v_scale=1.0,
        r_shift_cond=np.full(V, g),
        th_shift_cond=np.full(V, g),
    )

    def base_logp(z):
        return -0.5 * ((z - TEMPLATE) ** 2).sum((-1, -2)) / SIG**2 - 3 * V * jnp.log(
            SIG
        )

    def propose(params, rng, x_coords, x_velocs, K):
        kc, kv = jax.random.split(rng)
        cond = extract_internals(x_coords, zm)
        z = TEMPLATE[None] + SIG * jax.random.normal(kc, (K, V, 3))
        y, ld = jax.vmap(
            lambda c: apply_recalibration(c, zm, distort, cond_internals=cond)
        )(z)
        yv = jax.random.normal(kv, (K, V, 3))
        return y, yv, base_logp(z) - ld - 0.5 * (yv**2).sum((-1, -2))

    def reverse(params, y_coords, y_velocs, x_coords, x_velocs):
        conds = jax.vmap(lambda y: extract_internals(y, zm))(y_coords)
        xc = x_coords if x_coords.ndim == 3 else jnp.broadcast_to(
            x_coords, y_coords.shape
        )
        z, ld = jax.vmap(
            lambda c, cr, ct: apply_recalibration(
                c, zm, distort, inverse=True, cond_internals={"r": cr, "theta": ct}
            )
        )(xc, conds["r"], conds["theta"])
        xv = x_velocs if x_velocs.ndim == 3 else jnp.broadcast_to(
            x_velocs, y_velocs.shape
        )
        return base_logp(z) - ld - 0.5 * (xv**2).sum((-1, -2))

    # Fit AR stats: model (cond, sample) pairs + iid target-distributed
    # pairs (iid internal Gaussians rebuilt on the template skeleton).
    rng = np.random.default_rng(3)

    def draw_data(n, seed):
        rr = np.random.default_rng(seed)
        nr = ti["r"][None] + SR * rr.standard_normal((n, V)) * r_mask_np
        nt = ti["theta"][None] + ST * rr.standard_normal((n, V)) * th_mask_np
        f = jax.jit(jax.vmap(lambda a, b: replace_internals(
            jnp.asarray(TEMPLATE), zm, a, b)[0]))
        return np.asarray(f(jnp.asarray(nr, jnp.float32), jnp.asarray(nt, jnp.float32)))

    n = 1024
    cond_states = draw_data(512, 12)
    z_fit = TEMPLATE[None] + SIG * rng.standard_normal((512, V, 3))
    push = jax.jit(jax.vmap(lambda c, cc: apply_recalibration(
        c, zm, distort, cond_internals=extract_internals(cc, zm))[0]))
    model_samples = np.asarray(push(jnp.asarray(z_fit), jnp.asarray(cond_states)))
    data_x = draw_data(n, 10)
    data_y = draw_data(n, 11)
    ar = fit_channel_ar(zm, cond_states, model_samples, data_x, data_y)

    masses = jnp.ones((V,))
    cfg = MHConfig(num_proposal_steps=4, random_velocs=True, resample_velocs=True)

    def run_chain(fns, seed, iters=600):
        p_fn, r_fn = fns
        state = MHState(
            coords=jnp.asarray(TEMPLATE),
            velocs=jnp.zeros((V, 3)),
            e_pot=energy_fn(jnp.asarray(TEMPLATE)),
        )
        state, out = mh_segment(
            None, state, jax.random.PRNGKey(seed),
            p_fn, r_fn, energy_fn, masses, 1.0,
            num_iters=iters, K=4, config=cfg,
        )
        acc = float(np.asarray(out.accepted).mean())
        chain = np.asarray(out.coords)
        d = chain[:, 1:] - chain[:, :-1]
        return acc, np.sqrt((d * d).sum(-1))[iters // 3:]

    acc_plain, _ = run_chain((propose, reverse), seed=31)
    acc_swap, r_swap = run_chain(
        make_swap_proposal(propose, reverse, zm, ar), seed=32
    )

    # The swap replaces every mis-tracked stiff channel with the data AR.
    # NOTE the toy understates the gain: its 'flow' is a Cartesian-Gaussian
    # pushforward whose internal-coordinate conditionals carry lever-arm
    # cross-couplings that the per-coordinate AR cannot represent (the real
    # flagship flow is trained on MD where stiff internals are nearly
    # independent given x, and its stiff energy IS per-internal-separable).
    # The assertions here are exactness + a modest acceptance gain.
    assert acc_swap > 1.5 * acc_plain, (acc_swap, acc_plain)
    # bond marginal: Gaussian(R0, SR) times the r^2 measure weight
    np.testing.assert_allclose(r_swap.mean(), R0 + 2 * SR**2 / R0, atol=4e-3)
    np.testing.assert_allclose(r_swap.std(), SR, rtol=0.35)


def test_mvn_involution_property(zm):
    """Multivariate variant: the matrix-form swap applied twice is the
    identity (same block-elimination algebra as the scalar case)."""
    from timewarp_tpu.models.channel_swap import ChannelMVN, _stack_stiff, _unstack_stiff
    import jax.scipy.linalg as jsl

    rng = np.random.default_rng(4)
    m = 2 * V - 3
    # parameters centered so outputs stay in the valid internal range
    # (replace_internals clamps r > 1e-3 and theta into (0, pi), which is
    # bijective only off the clamp)
    ti_s = np.concatenate([
        np.asarray(extract_internals(jnp.asarray(TEMPLATE), zm)["r"])[1:],
        np.asarray(extract_internals(jnp.asarray(TEMPLATE), zm)["theta"])[2:],
    ])
    def rand_L():
        Q = 0.002 * rng.standard_normal((m, m))
        return np.linalg.cholesky(Q @ Q.T + 1e-5 * np.eye(m))
    def rand_A():
        return 0.2 * rng.standard_normal((m, m)) / np.sqrt(m)
    A_d_, A_m_ = rand_A(), rand_A()
    mv = ChannelMVN(
        A_d=A_d_,
        b_d=ti_s - ti_s @ A_d_ + 0.002 * rng.standard_normal(m),
        L_d=rand_L(),
        A_m=A_m_,
        b_m=ti_s - ti_s @ A_m_ + 0.002 * rng.standard_normal(m),
        L_m=rand_L(),
    )
    A_d, b_d, L_d = (jnp.asarray(v, jnp.float32) for v in (mv.A_d, mv.b_d, mv.L_d))
    A_m, b_m, L_m = (jnp.asarray(v, jnp.float32) for v in (mv.A_m, mv.b_m, mv.L_m))

    def step(x, y0, u, v):
        s_x = extract_internals(x, zm)
        s_y0 = extract_internals(y0, zm)
        sx, sy0 = _stack_stiff(s_x, V), _stack_stiff(s_y0, V)
        sy = b_d + sx @ A_d + L_d @ u
        ry, ty = _unstack_stiff(sy, s_y0, V)
        y, ld_y = replace_internals(y0, zm, ry, ty)
        sh = b_m + sy @ A_m + L_m @ v
        rx, tx = _unstack_stiff(sh, s_x, V)
        yhat0, ld_x = replace_internals(x, zm, rx, tx)
        up = jsl.solve_triangular(L_d, sx - b_d - sy @ A_d, lower=True)
        vp = jsl.solve_triangular(L_m, sy0 - b_m - sx @ A_m, lower=True)
        return y, yhat0, up, vp, float(ld_y + ld_x)

    x = jnp.asarray(TEMPLATE + 0.01 * rng.standard_normal((V, 3)), jnp.float32)
    y0 = jnp.asarray(TEMPLATE + 0.01 * rng.standard_normal((V, 3)), jnp.float32)
    u = jnp.asarray(rng.standard_normal(m), jnp.float32)
    v = jnp.asarray(rng.standard_normal(m), jnp.float32)

    y, yhat0, up, vp, ld1 = step(x, y0, u, v)
    x2, y02, u2, v2, ld2 = step(y, yhat0, up, vp)

    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-5)
    np.testing.assert_allclose(np.asarray(y02), np.asarray(y0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=5e-3)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=5e-3)
    np.testing.assert_allclose(ld1, -ld2, atol=2e-3)
