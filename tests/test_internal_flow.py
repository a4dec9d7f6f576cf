"""Internal-coordinate conditional flow (models/internal_flow.py):
grid round-trip, sample/density exactness through a real (tiny) inner
flow, and an MH smoke run with the real AMBER energy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.models.constructor import (
    ConditionalFlowDensityConfig,
    CustomAttentionTransformerNVPConfig,
    ModelConfig,
    build_model,
)
from timewarp_tpu.models.internal_flow import InternalFlow, make_internal_flow_proposal
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.models.recalibration import build_zmatrix
from timewarp_tpu.physics.amber.build import build_system

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


@pytest.fixture(scope="module")
def setup():
    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    V = topo.num_atoms
    zm = build_zmatrix(np.asarray(system.bond_idx), V, topo.positions)
    model = build_model(
        ModelConfig(
            model_type="custom_attention_transformer_nvp",
            custom_transformer_nvp_config=CustomAttentionTransformerNVPConfig(
                atom_embedding_dim=8,
                latent_mlp_hidden_dims=(16,),
                num_coupling_layers=2,
                num_transformer_layers=1,
                conditional_flow_density=ConditionalFlowDensityConfig(
                    use_displacement_as_target=False
                ),
                encoder_layer_config=CustomAttentionEncoderConfig(
                    d_model=16, dim_feedforward=32, num_heads=2,
                    attention_type="kernel", lengthscales=[0.2, 0.5],
                ),
            ),
        )
    )
    iflow = InternalFlow(model=model, zm=zm)
    center = iflow.template_center(topo.positions)
    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    coords0 = jnp.asarray(topo.positions)
    velocs0 = jnp.zeros((V, 3))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), atom_types, coords0[None], velocs0[None],
        jnp.zeros((1, V, 3)), velocs0[None], mask,
    )
    return system, topo, zm, iflow, center, atom_types, mask, params


def test_grid_round_trip(setup):
    _, topo, zm, iflow, center, *_ = setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(topo.positions)
    y = x + 0.01 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    ghost = jnp.asarray(rng.standard_normal(x.shape), jnp.float32) * (
        1.0 - iflow._grids()[0]
    )
    grid, ld1 = iflow.to_grid(y, x, center, ghost)
    y2, ghost2, ld2 = iflow.from_grid(grid, x, center)
    # the rebuild is anchored in x's frame: y2 is y's SHAPE (same grid),
    # not the same Cartesian embedding
    grid2, _ = iflow.to_grid(y2, x, center, ghost)
    np.testing.assert_allclose(np.asarray(grid2), np.asarray(grid), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ghost2), np.asarray(ghost), atol=1e-5)
    np.testing.assert_allclose(float(ld1), float(ld2), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(y2.mean(0)), np.asarray(x.mean(0)), atol=1e-5
    )


def test_sample_density_consistency(setup):
    """log_likelihood evaluated at the flow's own samples (with their
    ghosts) must reproduce the logp returned by sampling -- the end-to-end
    exactness of the pack/tanh/standardize/ghost bookkeeping."""
    _, topo, zm, iflow, center, atom_types, mask, params = setup
    x = jnp.asarray(topo.positions)
    xv = jnp.zeros_like(x)
    K = 6
    y, yv, ghost, lp_sample = iflow.sample_with_logp(
        params, jax.random.PRNGKey(3), atom_types, x, xv, mask, center, K
    )
    lp_eval = iflow.log_likelihood(
        params, atom_types, x, xv, y, yv, mask, center, ghost
    )
    assert np.isfinite(np.asarray(lp_sample)).all()
    np.testing.assert_allclose(
        np.asarray(lp_eval), np.asarray(lp_sample), atol=0.1, rtol=1e-4
    )


def test_mh_smoke_with_internal_flow(setup):
    """The internal-flow proposal pair runs through mh_segment with the
    real AMBER energy; bookkeeping stays finite and the chain stays at a
    finite state (untrained model: ~no acceptance expected)."""
    from timewarp_tpu.physics.constants import kbT
    from timewarp_tpu.sampling.mh import MHConfig, MHState, mh_segment

    system, topo, zm, iflow, center, atom_types, mask, params = setup
    from timewarp_tpu.sampling.mh import make_amber_energy

    energy_fn = make_amber_energy(system)
    coords0 = jnp.asarray(topo.positions)
    velocs0 = jnp.zeros_like(coords0)
    propose_fn, reverse_logp_fn = make_internal_flow_proposal(
        iflow, atom_types, mask, center
    )
    state = MHState(coords=coords0, velocs=velocs0, e_pot=energy_fn(coords0))
    cfg = MHConfig(num_proposal_steps=4)
    state, out = mh_segment(
        params, state, jax.random.PRNGKey(1),
        propose_fn, reverse_logp_fn, energy_fn,
        jnp.asarray(system.masses), float(kbT()),
        num_iters=4, K=4, config=cfg,
    )
    assert np.isfinite(np.asarray(out.exponent)).all()
    assert np.isfinite(np.asarray(out.p_xy)).all()
    assert np.isfinite(float(state.e_pot))
    # proposals must be valid conformations: finite, COM near x's
    assert np.isfinite(np.asarray(out.coords)).all()


def test_internal_flow_trains(setup):
    """NLL training on real AD pairs must improve: the family is trainable
    with plain Adam through the pack/ghost bookkeeping."""
    import optax

    system, topo, zm, iflow, center, atom_types, mask, params = setup
    md = np.load("/root/repo/runs/ad1_proto.npz")
    V = topo.num_atoms
    xs = jnp.asarray(md["coords"][0, :-1][:256])   # [N, V, 3]
    ys = jnp.asarray(md["coords"][0, 1:][:256])
    n_atoms = V

    def pair_nll(params, x, y, key):
        kv1, kv2, kg = jax.random.split(key, 3)
        xv = jax.random.normal(kv1, (V, 3))
        yv = jax.random.normal(kv2, (V, 3))
        dead = 1.0 - iflow._grids()[0]
        ghost = jax.random.normal(kg, (V, 3)) * dead
        lp = iflow.log_likelihood(
            params, atom_types, x, xv, y[None], yv[None], mask, center,
            ghost[None],
        )
        return -lp[0] / n_atoms

    def loss_fn(params, xb, yb, key):
        keys = jax.random.split(key, xb.shape[0])
        return jax.vmap(lambda x, y, k: pair_nll(params, x, y, k))(
            xb, yb, keys
        ).mean()

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, idx, key):
        l, g = jax.value_and_grad(loss_fn)(params, xs[idx], ys[idx], key)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    losses = []
    p = params
    for i in range(60):
        idx = jnp.asarray(rng.choice(256, 8, replace=False))
        key, k = jax.random.split(key)
        p, opt_state, l = step(p, opt_state, idx, k)
        losses.append(float(l))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first - 0.5, (first, last)
