"""MH sampler tests: exactness with a perfect proposal, bookkeeping
consistency, and an end-to-end smoke run with the real flow + AMBER energy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.sampling.mh import (
    MHConfig,
    MHState,
    compute_num_proposal_steps,
    kinetic_energy,
    make_amber_energy,
    make_flow_proposal,
    mh_segment,
    sample_with_model,
)


def test_compute_num_proposal_steps():
    # Low acceptance -> many proposals (capped); high acceptance -> 1.
    assert compute_num_proposal_steps(1e-3, max_num_proposal_steps=100) == 100
    assert compute_num_proposal_steps(0.9, max_num_proposal_steps=100) == 1
    assert compute_num_proposal_steps(0.5) == 4  # log(0.1)/log(0.5) = 3.32 -> 4


def _gaussian_setup(V=4):
    """Harmonic 'molecule': E_pot = 0.5 ||x||^2 in kT units. The perfect
    proposal draws y ~ N(0, 1) independently of x, so MH acceptance with
    random velocities must be exactly 1."""

    def energy_fn(coords):
        return 0.5 * (coords**2).sum((-1, -2))

    def propose_fn(params, rng, x_coords, x_velocs, K):
        kc, kv = jax.random.split(rng)
        y = jax.random.normal(kc, (K,) + x_coords.shape)
        yv = jax.random.normal(kv, (K,) + x_velocs.shape)
        logp = -0.5 * (y**2).sum((-1, -2)) - 0.5 * (yv**2).sum((-1, -2))
        return y, yv, logp

    def reverse_logp_fn(params, y_coords, y_velocs, x_coords, x_velocs):
        K = y_coords.shape[0]
        lx = -0.5 * (x_coords**2).sum() - 0.5 * (x_velocs**2).sum()
        return jnp.full((K,), lx)

    masses = jnp.ones((V,))
    return energy_fn, propose_fn, reverse_logp_fn, masses


def test_perfect_proposal_accepts_everything():
    V = 4
    energy_fn, propose_fn, reverse_logp_fn, masses = _gaussian_setup(V)
    coords0 = jnp.zeros((V, 3))
    velocs0 = jnp.zeros((V, 3))
    state = MHState(coords=coords0, velocs=velocs0, e_pot=energy_fn(coords0))
    cfg = MHConfig(num_proposal_steps=4, random_velocs=True, resample_velocs=True)
    state, out = mh_segment(
        None, state, jax.random.PRNGKey(0),
        propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
        num_iters=32, K=4, config=cfg,
    )
    # exponent = dE + p_xy - p_yx == 0 exactly for the perfect proposal.
    np.testing.assert_allclose(np.asarray(out.exponent), 0.0, atol=1e-4)
    assert bool(np.asarray(out.accepted).all())
    assert np.all(np.asarray(out.first_idx) == 0)


def test_perfect_proposal_samples_boltzmann():
    """Chain marginal matches the target N(0,1) distribution."""
    V = 2
    energy_fn, propose_fn, reverse_logp_fn, masses = _gaussian_setup(V)
    coords0 = jnp.zeros((V, 3))
    state = MHState(coords=coords0, velocs=coords0, e_pot=energy_fn(coords0))
    cfg = MHConfig(num_proposal_steps=1)
    state, out = mh_segment(
        None, state, jax.random.PRNGKey(1),
        propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
        num_iters=2000, K=1, config=cfg,
    )
    samples = np.asarray(out.coords).reshape(-1)
    assert abs(samples.mean()) < 0.05
    assert abs(samples.std() - 1.0) < 0.05


def test_biased_proposal_is_corrected_by_mh():
    """A too-wide proposal (sigma=1.5) must still produce N(0,1) marginals
    after MH correction -- the detailed-balance check."""
    V = 1
    sigma = 1.5

    def energy_fn(coords):
        return 0.5 * (coords**2).sum((-1, -2))

    def propose_fn(params, rng, x_coords, x_velocs, K):
        kc, kv = jax.random.split(rng)
        y = sigma * jax.random.normal(kc, (K,) + x_coords.shape)
        yv = jax.random.normal(kv, (K,) + x_velocs.shape)
        logp = (
            -0.5 * (y**2).sum((-1, -2)) / sigma**2
            - 0.5 * (yv**2).sum((-1, -2))
        )
        return y, yv, logp

    def reverse_logp_fn(params, y_coords, y_velocs, x_coords, x_velocs):
        K = y_coords.shape[0]
        lx = -0.5 * (x_coords**2).sum() / sigma**2 - 0.5 * (x_velocs**2).sum()
        return jnp.full((K,), lx)

    masses = jnp.ones((V,))
    coords0 = jnp.zeros((V, 3))
    state = MHState(coords=coords0, velocs=coords0, e_pot=energy_fn(coords0))
    cfg = MHConfig(num_proposal_steps=1)
    _, out = mh_segment(
        None, state, jax.random.PRNGKey(2),
        propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
        num_iters=6000, K=1, config=cfg,
    )
    acc_rate = float(np.asarray(out.accepted_any).mean())
    assert 0.3 < acc_rate < 0.98
    samples = np.asarray(out.coords).reshape(-1)
    assert abs(samples.std() - 1.0) < 0.06, samples.std()


def test_sample_with_model_driver():
    """Host driver produces the requested number of chain states with
    reference-compatible bookkeeping."""
    V = 2
    energy_fn, propose_fn, reverse_logp_fn, masses = _gaussian_setup(V)
    coords, velocs, accepted, stats = sample_with_model(
        None, propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
        jnp.zeros((V, 3)), jnp.zeros((V, 3)), jax.random.PRNGKey(0),
        num_samples=100, config=MHConfig(num_proposal_steps=4),
        segment_iters=16, adaptive_parallelism=True,
    )
    assert coords.shape == (101, V, 3)
    assert accepted > 0
    assert stats.acceptance_rate > 0.5
    assert len(stats) >= 100


def test_mh_flow_amber_end_to_end():
    """Full product smoke test: untrained flow proposals + AMBER energy on
    alanine dipeptide; chain must run, stay finite, and book-keep."""
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.models.constructor import (
        CustomAttentionTransformerNVPConfig,
        ModelConfig,
        build_model,
    )
    from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.constants import kbT

    topo = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    system, _ = build_system(topo)
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
    coords0 = jnp.asarray(topo.positions)
    velocs0 = jnp.zeros((V, 3))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), atom_types, coords0[None], velocs0[None],
        coords0[None], velocs0[None], mask,
    )

    propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types, mask)
    energy_fn = make_amber_energy(system)

    state = MHState(coords=coords0, velocs=velocs0, e_pot=energy_fn(coords0))
    cfg = MHConfig(num_proposal_steps=4)
    state, out = mh_segment(
        params, state, jax.random.PRNGKey(1),
        propose_fn, reverse_logp_fn, energy_fn, jnp.asarray(system.masses),
        float(kbT()), num_iters=8, K=4, config=cfg,
    )
    assert np.isfinite(np.asarray(out.exponent)).all()
    assert np.isfinite(np.asarray(out.p_xy)).all()
    # Untrained flow: proposals are garbage, acceptance should be ~0 but the
    # chain must remain at the (finite) initial state.
    assert np.isfinite(float(state.e_pot))


def test_rotation_preserves_exactness():
    """With per-step random rotation (reference:
    utils/evaluation_utils.py:604-607) the perfect-proposal chain still
    accepts everything: the harmonic energy is rotation invariant and the
    acceptance exponent is recomputed from the rotated state."""
    V = 4
    energy_fn, propose_fn, reverse_logp_fn, masses = _gaussian_setup(V)
    coords0 = jnp.zeros((V, 3))
    state = MHState(coords=coords0, velocs=coords0, e_pot=energy_fn(coords0))
    cfg = MHConfig(
        num_proposal_steps=2, random_velocs=True, resample_velocs=True, rotate=True
    )
    state, out = mh_segment(
        None, state, jax.random.PRNGKey(3),
        propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
        num_iters=64, K=2, config=cfg,
    )
    assert bool(np.asarray(out.accepted_any).all())
    # The proposed-from states recorded for chain bookkeeping are rotated
    # copies, not the raw previous states.
    assert np.isfinite(np.asarray(out.x_coords)).all()


def test_interleaved_md_steps():
    """Interleaved Langevin steps on current state and proposals
    (reference: utils/evaluation_utils.py:558-626) run fused in the scan and
    keep the chain finite on the real AMBER dipeptide."""
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.constants import kbT
    from timewarp_tpu.sampling.mh import make_md_step_fn

    topo = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    system, _ = build_system(topo)
    V = topo.num_atoms
    energy_fn = make_amber_energy(system)

    # Identity-ish proposal: jitter around the current state.
    def propose_fn(params, rng, x_coords, x_velocs, K):
        kc, kv = jax.random.split(rng)
        y = x_coords[None] + 1e-3 * jax.random.normal(kc, (K, V, 3))
        yv = jax.random.normal(kv, (K, V, 3))
        logp = jnp.zeros((K,))
        return y, yv, logp

    def reverse_logp_fn(params, y_coords, y_velocs, x_coords, x_velocs):
        return jnp.zeros((y_coords.shape[0],))

    masses = jnp.asarray(system.masses)
    coords0 = jnp.asarray(topo.positions)
    state = MHState(coords=coords0, velocs=jnp.zeros((V, 3)), e_pot=energy_fn(coords0))
    cfg = MHConfig(
        num_proposal_steps=2, random_velocs=True, resample_velocs=True,
        md_steps_current=3, md_steps_proposal=2,
    )
    state, out = mh_segment(
        None, state, jax.random.PRNGKey(4),
        propose_fn, reverse_logp_fn, energy_fn, masses, float(kbT()),
        num_iters=8, K=2, config=cfg,
        md_step_fn=make_md_step_fn(system),
    )
    assert np.isfinite(np.asarray(out.coords)).all()
    assert np.isfinite(np.asarray(out.e_pot_y)).all()
    # MD on the current state moves it: recorded x differs from the carry-in.
    assert not np.allclose(np.asarray(out.x_coords[0]), np.asarray(coords0))


def test_pipelined_driver_deterministic():
    """The pipelined segment driver (dispatch-ahead + AOT bucket prewarm)
    gives identical chains across runs with the same key."""
    V = 3
    energy_fn, propose_fn, reverse_logp_fn, masses = _gaussian_setup(V)

    def run():
        return sample_with_model(
            None, propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
            jnp.zeros((V, 3)), jnp.zeros((V, 3)), jax.random.PRNGKey(7),
            num_samples=80, config=MHConfig(num_proposal_steps=4),
            segment_iters=8, adaptive_parallelism=True,
        )

    c1, v1, a1, s1 = run()
    c2, v2, a2, s2 = run()
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(v1, v2)
    assert a1 == a2
    assert s1.num_proposals == s2.num_proposals > 0


def test_adaptive_smoothing_matches_reference_formula():
    """The driver's acceptance-probability smoothing must be the reference's
    per-iteration update (reference: utils/evaluation_utils.py:684-697):
    p <- s * accepted_any + (1 - s)^first_acc_idx * p, with
    first_acc_idx = K - 1 when nothing was accepted."""
    import numpy as np

    from timewarp_tpu.sampling.mh import MHConfig, sample_with_model  # noqa: F401

    s = 0.01
    rng = np.random.default_rng(0)
    K = 8
    accepted_any = rng.random(50) < 0.3
    first_idx = np.where(accepted_any, rng.integers(0, K, 50), K - 1)

    # Reference transcription.
    p_ref = 1e-3
    for t in range(50):
        did_not_accept = not accepted_any[t]
        p_ref = s * (1 - did_not_accept) + (1 - s) ** int(first_idx[t]) * p_ref

    # Driver's update (inlined from sample_with_model.update_acc_prob).
    p = 1e-3
    for t in range(50):
        p = s * float(accepted_any[t]) + (1 - s) ** int(first_idx[t]) * p

    assert abs(p - p_ref) < 1e-12
