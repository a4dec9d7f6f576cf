"""Ensemble MH sampler: bookkeeping exactness, Boltzmann correctness of the
aggregated walkers, and an end-to-end smoke with the real flow + AMBER
energy + on-device Ramachandran accumulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.sampling.ensemble import (
    EnsembleCarry,
    ensemble_segment,
    histogram_kl,
    paired_phi_psi_indices,
    ramachandran_histogram,
    sample_ensemble,
)
from timewarp_tpu.sampling.mh import MHConfig, MHState


def _gaussian_setup(V=4, sigma=1.0):
    """Harmonic target: E = 0.5||x||^2 kT; proposal y ~ N(0, sigma^2)."""

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

    return energy_fn, propose_fn, reverse_logp_fn, jnp.ones((V,))


def _run_segment(W, V, num_iters, K, sigma=1.0, bins=6, seed=0):
    energy_fn, propose_fn, reverse_logp_fn, masses = _gaussian_setup(V, sigma)
    quads = np.array([[0, 1, 2, 3]], np.int32)  # arbitrary 4 atoms
    coords0 = jnp.zeros((W, V, 3))
    carry = EnsembleCarry(
        state=MHState(
            coords=coords0, velocs=jnp.zeros((W, V, 3)), e_pot=energy_fn(coords0)
        ),
        hist=jnp.zeros(bins * bins, jnp.float32),
        num_accepted=jnp.int32(0),
        num_states=jnp.int32(0),
    )
    carry = ensemble_segment(
        None, carry, jax.random.PRNGKey(seed), masses, jnp.float32(1.0),
        jnp.asarray(quads), jnp.asarray(quads),
        propose_fn=propose_fn, reverse_logp_fn=reverse_logp_fn,
        energy_fn=energy_fn, num_iters=num_iters, K=K, bins=bins,
        config=MHConfig(num_proposal_steps=K),
    )
    return carry


def test_bookkeeping_totals():
    """Histogram mass == residue pairs * chain states; states within
    [iters*W, iters*W*K]."""
    W, iters, K = 4, 16, 4
    carry = _run_segment(W, V=4, num_iters=iters, K=K)
    n_states = int(carry.num_states)
    assert iters * W <= n_states <= iters * W * K
    np.testing.assert_allclose(float(np.asarray(carry.hist).sum()), n_states)
    assert 0 < int(carry.num_accepted) <= iters * W


def test_perfect_proposal_accepts_everything():
    carry = _run_segment(W=3, V=4, num_iters=32, K=4, sigma=1.0)
    # perfect proposal: every iteration accepts its first proposal.
    assert int(carry.num_accepted) == 3 * 32
    assert int(carry.num_states) == 3 * 32


def test_ensemble_matches_boltzmann():
    """Aggregated final states of many walkers under a biased proposal must
    still follow the N(0,1) target (detailed balance across the vmap)."""
    W, iters = 64, 400
    carry = _run_segment(W, V=2, num_iters=iters, K=1, sigma=1.5, seed=3)
    samples = np.asarray(carry.state.coords).reshape(-1)
    assert abs(samples.mean()) < 0.1
    assert abs(samples.std() - 1.0) < 0.1, samples.std()


def test_adaptive_parallelism_shrinks_K():
    """With a perfect proposal (acceptance ~1) the adaptive driver must
    rebucket K down to 1 after the first segment (reference K formula:
    utils/evaluation_utils.py:32-64)."""
    from timewarp_tpu.data.pdb import parse_pdb

    topo = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    V = topo.num_atoms
    energy_fn, propose_fn, reverse_logp_fn, masses = _gaussian_setup(V, sigma=1.0)
    W = 4
    res = sample_ensemble(
        None, propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
        jnp.zeros((W, V, 3)), jax.random.PRNGKey(0), topo,
        num_proposals=W * 32 * 8 + 1,
        config=MHConfig(num_proposal_steps=16, max_num_proposal_steps=32),
        bins=6, segment_iters=8, adaptive_parallelism=True,
    )
    assert len(res.K_trace) >= 2
    # Pessimistic start (acc_prob ~1e-3) -> max bucket; perfect acceptance
    # then walks K down segment by segment (EMA-smoothed, so not a jump).
    assert res.K_trace[0] == 32
    assert res.K_trace[-1] <= 8
    assert all(b <= a for a, b in zip(res.K_trace, res.K_trace[1:]))
    assert res.acceptance_rate > 0.9


def test_ensemble_sharded_over_mesh():
    """Walker axis sharded over the virtual 8-device CPU mesh must produce
    EXACTLY the same chain statistics as the single-device run: walkers are
    independent chains with per-walker RNG keys, and the histogram updates
    are integer-valued float adds, so sharding cannot change the result."""
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 2:
        pytest.skip("needs the virtual multi-device mesh")
    topo = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    V = topo.num_atoms
    energy_fn, propose_fn, reverse_logp_fn, masses = _gaussian_setup(V, sigma=1.2)
    W = 2 * jax.device_count()
    kwargs = dict(
        num_proposals=W * 8 * 4,
        config=MHConfig(num_proposal_steps=4),
        bins=6,
        segment_iters=8,
    )
    res_1 = sample_ensemble(
        None, propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
        jnp.zeros((W, V, 3)), jax.random.PRNGKey(0), topo, **kwargs,
    )
    res_m = sample_ensemble(
        None, propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
        jnp.zeros((W, V, 3)), jax.random.PRNGKey(0), topo,
        mesh=make_mesh(), **kwargs,
    )
    assert res_m.num_states == res_1.num_states
    assert res_m.num_accepted == res_1.num_accepted
    np.testing.assert_allclose(res_m.hist, res_1.hist)
    np.testing.assert_allclose(res_m.final_coords, res_1.final_coords, atol=1e-6)
    with pytest.raises(ValueError):
        sample_ensemble(
            None, propose_fn, reverse_logp_fn, energy_fn, masses, 1.0,
            jnp.zeros((jax.device_count() + 1, V, 3)), jax.random.PRNGKey(0),
            topo, mesh=make_mesh(), **kwargs,
        )


def test_paired_indices_alanine():
    from timewarp_tpu.data.pdb import parse_pdb

    topo = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    phi, psi = paired_phi_psi_indices(topo)
    assert phi.shape == (1, 4) and psi.shape == (1, 4)
    # phi and psi share the N-CA-C core of the central residue
    assert phi[0, 1] == psi[0, 0] and phi[0, 2] == psi[0, 1] and phi[0, 3] == psi[0, 2]


def test_histogram_kl_zero_for_identical():
    h = np.random.default_rng(0).random((18, 18))
    assert histogram_kl(h, h) < 1e-9
    assert histogram_kl(h, h[::-1]) > 0


@pytest.mark.slow
def test_ensemble_flow_amber_end_to_end():
    """Real flow + AMBER + Ramachandran accumulation on alanine dipeptide."""
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.models.constructor import (
        CustomAttentionTransformerNVPConfig,
        ModelConfig,
        build_model,
    )
    from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.sampling.mh import make_amber_energy, make_flow_proposal

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
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), atom_types, coords0[None],
        jnp.zeros((1, V, 3)), coords0[None], jnp.zeros((1, V, 3)), mask,
    )
    propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types, mask)
    energy_fn = make_amber_energy(system)

    W = 2
    res = sample_ensemble(
        params, propose_fn, reverse_logp_fn, energy_fn,
        jnp.asarray(system.masses), 1.0,
        jnp.tile(coords0[None], (W, 1, 1)), jax.random.PRNGKey(1), topo,
        num_proposals=2 * 2 * 8, config=MHConfig(num_proposal_steps=2),
        bins=6, segment_iters=4,
    )
    assert res.hist.shape == (6, 6)
    assert res.hist.sum() == res.num_states
    assert np.isfinite(res.final_coords).all()
    assert res.snapshots.shape[1:] == (W, V, 3)
    # MD-data histogram helper bins consistently
    h_md = ramachandran_histogram(np.asarray(res.snapshots).reshape(-1, V, 3), topo, bins=6)
    assert h_md.sum() == res.snapshots.shape[0] * W
