"""Internal-coordinate recalibration layer: bijectivity, exact Jacobian,
equivariance, moment-matching fit, and MH exactness through the
recalibrated proposal (models/recalibration.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.models.recalibration import (
    RecalAffine,
    ZMatrix,
    apply_recalibration,
    build_zmatrix,
    extract_internals,
    fit_recalibration,
)
from timewarp_tpu.physics.amber.build import build_system

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


@pytest.fixture(scope="module")
def ad_setup():
    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    coords = jnp.asarray(topo.positions)
    zm = build_zmatrix(np.asarray(system.bond_idx), coords.shape[0], topo.positions)
    return system, coords, zm


def _random_affine(zm, rng, strength=0.15):
    V = zm.num_atoms
    return RecalAffine(
        r_scale=1.0 + strength * rng.uniform(-1, 1, V),
        r_shift=0.005 * rng.uniform(-1, 1, V),
        th_scale=1.0 + strength * rng.uniform(-1, 1, V),
        th_shift=0.03 * rng.uniform(-1, 1, V),
        v_scale=1.1,
    )


def test_zmatrix_covers_molecule(ad_setup):
    _, coords, zm = ad_setup
    V = coords.shape[0]
    assert sorted(zm.order.tolist()) == list(range(V))
    # every non-root slot's refs appear earlier in the order
    pos = {int(a): k for k, a in enumerate(zm.order)}
    for k in range(1, V):
        assert pos[int(zm.a[k])] < k
        if k >= 2:
            assert pos[int(zm.b[k])] < k
        if k >= 3:
            assert pos[int(zm.c[k])] < k
            assert len({int(zm.a[k]), int(zm.b[k]), int(zm.c[k])}) == 3


def test_identity_affine_is_identity(ad_setup):
    _, coords, zm = ad_setup
    ident = RecalAffine.identity(zm.num_atoms)
    out, ld = apply_recalibration(coords, zm, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(coords), atol=1e-5)
    assert abs(float(ld)) < 1e-4


def test_round_trip_and_logdet_consistency(ad_setup):
    _, coords, zm = ad_setup
    rng = np.random.default_rng(0)
    affine = _random_affine(zm, rng)
    y, ld_fwd = apply_recalibration(coords, zm, affine)
    x_back, ld_inv = apply_recalibration(y, zm, affine, inverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(coords), atol=2e-5)
    # both directions report the SAME forward-map logdet (at the unprimed point)
    np.testing.assert_allclose(float(ld_fwd), float(ld_inv), atol=1e-3)


def test_logdet_matches_autodiff(ad_setup):
    _, coords, zm = ad_setup
    rng = np.random.default_rng(1)
    affine = _random_affine(zm, rng, strength=0.1)

    flat = np.asarray(coords).reshape(-1).astype(np.float64)

    def f(v):
        out, _ = apply_recalibration(v.reshape(-1, 3), zm, affine)
        return out.reshape(-1)

    with jax.enable_x64(True):
        J = jax.jacfwd(f)(jnp.asarray(flat))
        sign, logabsdet = np.linalg.slogdet(np.asarray(J))
        _, ld = apply_recalibration(jnp.asarray(flat.reshape(-1, 3)), zm, affine)
    assert sign > 0
    np.testing.assert_allclose(float(ld), float(logabsdet), atol=1e-3)


def test_equivariance(ad_setup):
    _, coords, zm = ad_setup
    rng = np.random.default_rng(2)
    affine = _random_affine(zm, rng)
    from timewarp_tpu.utils.geometry import random_rotation_matrix

    Q = random_rotation_matrix(jax.random.PRNGKey(3), dtype=jnp.float32)
    t = jnp.asarray([0.3, -0.1, 0.7])
    y1, ld1 = apply_recalibration(coords @ Q.T + t, zm, affine)
    y0, ld0 = apply_recalibration(coords, zm, affine)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0 @ Q.T + t), atol=2e-5)
    np.testing.assert_allclose(float(ld1), float(ld0), atol=1e-3)


def test_fit_matches_marginals(ad_setup):
    """Fitting on over-dispersed samples must map their internal-coordinate
    marginals onto the target's mean/std."""
    _, coords, zm = ad_setup
    rng = np.random.default_rng(4)
    base = np.asarray(coords)
    # 'data': small isotropic jitter; 'model': 3x larger jitter (over-dispersed)
    data = base[None] + 0.004 * rng.standard_normal((256, *base.shape))
    model = base[None] + 0.012 * rng.standard_normal((256, *base.shape))
    affine = fit_recalibration(zm, model, data)
    mapped = np.stack(
        [np.asarray(apply_recalibration(jnp.asarray(m), zm, affine)[0]) for m in model[:128]]
    )
    ex = jax.vmap(lambda c: extract_internals(c, zm))
    ri_map = np.asarray(ex(jnp.asarray(mapped))["r"])[:, 1:]
    ri_dat = np.asarray(ex(jnp.asarray(data))["r"])[:, 1:]
    # mapped bond-length stds within 25% of the data stds (moment-matched)
    ratio = ri_map.std(0) / (ri_dat.std(0) + 1e-12)
    assert np.all(ratio < 1.35) and np.all(ratio > 0.65)


def test_mh_exact_with_recalibrated_proposal():
    """A deliberately over-dispersed Gaussian proposal, recalibrated, must
    (a) accept much more and (b) still sample the same target as the exact
    un-recalibrated chain -- the unbiasedness check for the density
    bookkeeping through make_flow_proposal's recalibration wrapper."""
    from timewarp_tpu.sampling.mh import MHConfig, MHState, mh_segment

    # 4-atom 'molecule'; target = isotropic Gaussian around a template in
    # EVERY Cartesian dim (so the fitted 'data' marginals are exactly the
    # target's -- the toy isolates the density bookkeeping, not physics).
    V = 4
    bond_idx = np.array([[0, 1], [1, 2], [2, 3]])
    r0 = 0.15
    sig = 0.01  # target per-coordinate std

    template = np.array(
        [[0.0, 0, 0], [r0, 0, 0], [r0, r0, 0], [r0, r0, r0]], np.float32
    )

    def energy_fn(coords):
        return 0.5 * ((coords - template) ** 2).sum((-1, -2)) / sig**2

    zm = build_zmatrix(bond_idx, V, template)

    # The 'flow' proposal: an exact target sample pushed through a KNOWN
    # internal-coordinate distortion (bonds/angles dispersed 2x about the
    # template values) -- its density is the exact pushforward, so the
    # plain chain is a valid but poorly-accepting independence sampler
    # whose mismatch lives entirely in the dims the recalibration covers.
    ti = jax.tree_util.tree_map(np.asarray, extract_internals(jnp.asarray(template), zm))
    distort = RecalAffine(
        r_scale=np.full(V, 2.0),
        r_shift=-ti["r"],
        th_scale=np.full(V, 2.0),
        th_shift=-ti["theta"],
        v_scale=1.0,
    )

    def base_logp(z):
        return -0.5 * ((z - template) ** 2).sum((-1, -2)) / sig**2 - 3 * V * jnp.log(
            sig
        )

    def make_gaussian_proposal(recal):
        def propose(params, rng, x_coords, x_velocs, K):
            kc, kv = jax.random.split(rng)
            z = template[None] + sig * jax.random.normal(kc, (K, V, 3))
            y, ld = jax.vmap(lambda c: apply_recalibration(c, zm, distort))(z)
            yv = jax.random.normal(kv, (K, V, 3))
            logp = base_logp(z) - ld - 0.5 * (yv**2).sum((-1, -2))
            return y, yv, logp

        def reverse(params, y_coords, y_velocs, x_coords, x_velocs):
            K = y_coords.shape[0]
            z, ld = apply_recalibration(x_coords, zm, distort, inverse=True)
            lx = base_logp(z) - ld - 0.5 * (x_velocs**2).sum()
            return jnp.full((K,), lx)

        if recal is None:
            return propose, reverse

        from timewarp_tpu.models.recalibration import apply_recalibration as ar

        zmr, affine = recal
        v_scale = jnp.asarray(affine.v_scale, jnp.float32)
        n_dof = 3.0 * V

        def propose_r(params, rng, x_coords, x_velocs, K):
            yc0, yv0, logp = propose(params, rng, x_coords, x_velocs, K)
            yc, ld = jax.vmap(lambda c: ar(c, zmr, affine))(yc0)
            return yc, v_scale * yv0, logp - ld - n_dof * jnp.log(v_scale)

        def reverse_r(params, y_coords, y_velocs, x_coords, x_velocs):
            x0, ld = ar(x_coords, zmr, affine, inverse=True)
            lp = reverse(params, y_coords, y_velocs, x0, x_velocs / v_scale)
            return lp - ld - n_dof * jnp.log(v_scale)

        return propose_r, reverse_r

    # Fit the recalibration: model samples drawn from the distorted
    # proposal, 'data' samples from the exact target.
    rng = np.random.default_rng(7)
    z_fit = template[None] + sig * rng.standard_normal((2048, V, 3))
    model_samples = np.asarray(
        jax.vmap(lambda c: apply_recalibration(c, zm, distort)[0])(jnp.asarray(z_fit))
    )
    data_samples = template[None] + sig * rng.standard_normal((2048, V, 3))
    affine = fit_recalibration(zm, model_samples, data_samples)

    masses = jnp.ones((V,))
    cfg = MHConfig(num_proposal_steps=4, random_velocs=True, resample_velocs=True)

    def run_chain(recal, seed, iters=600):
        propose, reverse = make_gaussian_proposal(recal)
        state = MHState(
            coords=jnp.asarray(template),
            velocs=jnp.zeros((V, 3)),
            e_pot=energy_fn(jnp.asarray(template)),
        )
        state, out = mh_segment(
            None, state, jax.random.PRNGKey(seed),
            propose, reverse, energy_fn, masses, 1.0,
            num_iters=iters, K=4, config=cfg,
        )
        acc = float(np.asarray(out.accepted).mean())
        chain = np.asarray(out.coords)  # [T, V, 3]
        d = chain[:, 1:] - chain[:, :-1]
        r = np.sqrt((d * d).sum(-1))  # [T, 3] bond lengths
        return acc, r[iters // 3:]

    acc_plain, r_plain = run_chain(None, seed=11)
    acc_recal, r_recal = run_chain((zm, affine), seed=12)

    # (a) recalibration must raise acceptance substantially
    assert acc_recal > 2.0 * acc_plain, (acc_recal, acc_plain)
    # (b) both chains are exact: bond-length marginals agree with each other
    # and with the analytic target (bond vector ~ N((r0,0,0), 2 sig^2 I)).
    sig_eff = np.sqrt(2.0) * sig
    r_mean_exact = r0 + sig_eff**2 / r0  # first-order Jacobian correction
    assert abs(r_recal.mean() - r_plain.mean()) < 3e-3
    np.testing.assert_allclose(r_recal.mean(), r_mean_exact, atol=3e-3)
    np.testing.assert_allclose(r_recal.std(), sig_eff, rtol=0.35)


def test_make_flow_proposal_recal_wrapper_identity(ad_setup):
    """make_flow_proposal(recalibration=...) with the identity affine must
    reproduce the plain proposal's samples and MH exponents (wires the
    wrapper's sign conventions to the base path)."""
    from timewarp_tpu.models.constructor import (
        CustomAttentionTransformerNVPConfig,
        ModelConfig,
        build_model,
    )
    from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
    from timewarp_tpu.sampling.mh import make_flow_proposal

    system, coords0, zm = ad_setup
    topo = parse_pdb(AD_PDB)
    V = topo.num_atoms
    model = build_model(
        ModelConfig(
            model_type="custom_attention_transformer_nvp",
            custom_transformer_nvp_config=CustomAttentionTransformerNVPConfig(
                atom_embedding_dim=8,
                latent_mlp_hidden_dims=(16,),
                num_coupling_layers=2,
                num_transformer_layers=1,
                encoder_layer_config=CustomAttentionEncoderConfig(
                    d_model=16, dim_feedforward=32, num_heads=2,
                    attention_type="kernel", lengthscales=[0.2, 0.5],
                ),
            ),
        )
    )
    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    velocs0 = jnp.zeros((V, 3))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), atom_types, coords0[None], velocs0[None],
        coords0[None], velocs0[None], mask,
    )

    base_p, base_r = make_flow_proposal(model, atom_types, mask)
    ident = RecalAffine.identity(zm.num_atoms)
    rec_p, rec_r = make_flow_proposal(
        model, atom_types, mask, recalibration=(zm, ident)
    )

    rng = jax.random.PRNGKey(5)
    xv = jnp.asarray(np.random.default_rng(0).standard_normal((V, 3)), jnp.float32)
    yc0, yv0, lp0 = base_p(params, rng, coords0, xv, 4)
    yc1, yv1, lp1 = rec_p(params, rng, coords0, xv, 4)
    np.testing.assert_allclose(np.asarray(yc1), np.asarray(yc0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(yv1), np.asarray(yv0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0), atol=0.2)

    r0 = base_r(params, yc0, yv0, coords0, xv)
    r1 = rec_r(params, yc0, yv0, coords0, xv)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=0.2)


def test_conditional_round_trip_logdet_and_com(ad_setup):
    """Conditional affine: bijectivity, forward-logdet symmetry, autodiff
    Jacobian parity (which also validates that the COM-restoring
    translation leaves the log-det unchanged), and COM preservation."""
    _, coords, zm = ad_setup
    rng = np.random.default_rng(5)
    V = zm.num_atoms
    base = _random_affine(zm, rng, strength=0.1)
    affine = RecalAffine(
        r_scale=base.r_scale,
        r_shift=base.r_shift,
        th_scale=base.th_scale,
        th_shift=base.th_shift,
        v_scale=1.0,
        r_shift_cond=0.2 * rng.uniform(-1, 1, V),
        th_shift_cond=0.1 * rng.uniform(-1, 1, V),
    )
    cond_state = coords + 0.01 * jnp.asarray(
        rng.standard_normal(coords.shape), jnp.float32
    )
    cond = extract_internals(cond_state, zm)

    y, ld_fwd = apply_recalibration(coords, zm, affine, cond_internals=cond)
    # COM preserved exactly (uniform mean, the flow's convention)
    np.testing.assert_allclose(
        np.asarray(y.mean(0)), np.asarray(coords.mean(0)), atol=1e-5
    )
    x_back, ld_inv = apply_recalibration(
        y, zm, affine, inverse=True, cond_internals=cond
    )
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(coords), atol=2e-5)
    np.testing.assert_allclose(float(ld_fwd), float(ld_inv), atol=1e-3)

    flat = np.asarray(coords).reshape(-1).astype(np.float64)

    def f(v):
        out, _ = apply_recalibration(
            v.reshape(-1, 3), zm, affine, cond_internals=cond
        )
        return out.reshape(-1)

    with jax.enable_x64(True):
        J = jax.jacfwd(f)(jnp.asarray(flat))
        sign, logabsdet = np.linalg.slogdet(np.asarray(J))
        _, ld = apply_recalibration(
            jnp.asarray(flat.reshape(-1, 3)), zm, affine, cond_internals=cond
        )
    assert sign > 0
    np.testing.assert_allclose(float(ld), float(logabsdet), atol=1e-3)


def test_mh_exact_with_conditional_recalibration():
    """Tracking-proposal failure mode (round 4): the proposal's internals
    TRACK the conditioning state with an exaggerated gain and a sharp
    residual. Unconditional marginal matching cannot fix this; conditional
    moment matching (fit_conditional_recalibration) must (a) raise
    acceptance and (b) keep the chain unbiased."""
    from timewarp_tpu.models.recalibration import fit_conditional_recalibration
    from timewarp_tpu.models.recalibration import wrap_proposal
    from timewarp_tpu.sampling.mh import MHConfig, MHState, mh_segment

    V = 4
    bond_idx = np.array([[0, 1], [1, 2], [2, 3]])
    r0 = 0.15
    sig = 0.01

    template = np.array(
        [[0.0, 0, 0], [r0, 0, 0], [r0, r0, 0], [r0, r0, r0]], np.float32
    )

    def energy_fn(coords):
        return 0.5 * ((coords - template) ** 2).sum((-1, -2)) / sig**2

    zm = build_zmatrix(bond_idx, V, template)
    ti = jax.tree_util.tree_map(np.asarray, extract_internals(jnp.asarray(template), zm))

    # Tracking distortion: internal' = s0*z_int + g*x_int + (1-s0-g)*t_int
    # (z ~ exact target sample). Conditional mean gain g = 0.9 toward x,
    # sharp residual s0 = 0.35 -- but the TARGET pairs are iid (gain 0).
    s0, g = 0.35, 0.9
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
        return -0.5 * ((z - template) ** 2).sum((-1, -2)) / sig**2 - 3 * V * jnp.log(
            sig
        )

    def propose(params, rng, x_coords, x_velocs, K):
        kc, kv = jax.random.split(rng)
        cond = extract_internals(x_coords, zm)
        z = template[None] + sig * jax.random.normal(kc, (K, V, 3))
        y, ld = jax.vmap(
            lambda c: apply_recalibration(c, zm, distort, cond_internals=cond)
        )(z)
        yv = jax.random.normal(kv, (K, V, 3))
        logp = base_logp(z) - ld - 0.5 * (yv**2).sum((-1, -2))
        return y, yv, logp

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

    # Fit data: model (cond, sample) pairs + iid target pairs.
    rng = np.random.default_rng(9)
    n = 2048
    cond_states = template[None] + sig * rng.standard_normal((n, V, 3))
    z_fit = template[None] + sig * rng.standard_normal((n, V, 3))
    ex = jax.jit(jax.vmap(lambda c, cc: apply_recalibration(
        c, zm, distort, cond_internals=extract_internals(cc, zm))[0]))
    model_samples = np.asarray(ex(jnp.asarray(z_fit), jnp.asarray(cond_states)))
    data_x = template[None] + sig * rng.standard_normal((n, V, 3))
    data_y = template[None] + sig * rng.standard_normal((n, V, 3))
    affine = fit_conditional_recalibration(
        zm, cond_states, model_samples, data_x, data_y
    )

    masses = jnp.ones((V,))
    cfg = MHConfig(num_proposal_steps=4, random_velocs=True, resample_velocs=True)

    def run_chain(recal, seed, iters=600):
        p_fn, r_fn = (propose, reverse) if recal is None else wrap_proposal(
            propose, reverse, zm, recal
        )
        state = MHState(
            coords=jnp.asarray(template),
            velocs=jnp.zeros((V, 3)),
            e_pot=energy_fn(jnp.asarray(template)),
        )
        state, out = mh_segment(
            None, state, jax.random.PRNGKey(seed),
            p_fn, r_fn, energy_fn, masses, 1.0,
            num_iters=iters, K=4, config=cfg,
        )
        acc = float(np.asarray(out.accepted).mean())
        chain = np.asarray(out.coords)
        d = chain[:, 1:] - chain[:, :-1]
        r = np.sqrt((d * d).sum(-1))
        return acc, r[iters // 3:]

    acc_plain, r_plain = run_chain(None, seed=21)
    acc_recal, r_recal = run_chain(affine, seed=22)

    assert acc_recal > 1.5 * acc_plain, (acc_recal, acc_plain)
    sig_eff = np.sqrt(2.0) * sig
    r_mean_exact = r0 + sig_eff**2 / r0
    np.testing.assert_allclose(r_recal.mean(), r_mean_exact, atol=3e-3)
    np.testing.assert_allclose(r_recal.std(), sig_eff, rtol=0.35)
