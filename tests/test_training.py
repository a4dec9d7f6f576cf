"""Training-step tests: loss decreases, multi-device sharding executes, and
the ZeRO-1 optimizer-state sharding really shards."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.batch import collate_dense
from timewarp_tpu.losses import LossConfig, make_loss
from timewarp_tpu.models.constructor import (
    CustomAttentionTransformerNVPConfig,
    ModelConfig,
    build_model,
)
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.parallel.mesh import make_mesh, shard_batch
from timewarp_tpu.training.optim import OptimizerConfig, build_optimizer
from timewarp_tpu.training.train_step import TrainState, make_train_step


def tiny_model():
    return build_model(
        ModelConfig(
            model_type="custom_attention_transformer_nvp",
            custom_transformer_nvp_config=CustomAttentionTransformerNVPConfig(
                atom_embedding_dim=8,
                latent_mlp_hidden_dims=(16,),
                num_coupling_layers=2,
                num_transformer_layers=1,
                encoder_layer_config=CustomAttentionEncoderConfig(
                    d_model=16, dim_feedforward=32, num_heads=2,
                    attention_type="kernel", lengthscales=[0.5, 1.0],
                ),
            ),
        )
    )


def make_batch(rng, B=8, V=8):
    atom_types = jnp.asarray(rng.integers(0, 5, (B, V)).astype(np.int32))
    x = jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32))
    from timewarp_tpu.data.batch import DenseBatch

    return DenseBatch(
        atom_types=atom_types,
        atom_coords=x,
        atom_velocs=jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32)),
        atom_forces=jnp.zeros((B, V, 3), jnp.float32),
        atom_coord_targets=x + 0.05,
        atom_veloc_targets=jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32)),
        atom_force_targets=jnp.zeros((B, V, 3), jnp.float32),
        masked_elements=jnp.zeros((B, V), bool),
        adj_list=jnp.zeros((B, 4, 2), jnp.int32),
        adj_mask=jnp.zeros((B, 4), bool),
        names=tuple(["mol"] * B),
    )


def _init_state(model, batch, optimizer):
    params = model.init(
        jax.random.PRNGKey(0),
        batch.atom_types,
        batch.atom_coords,
        batch.atom_velocs,
        batch.atom_coord_targets,
        batch.atom_veloc_targets,
        batch.masked_elements,
    )
    return TrainState.create(params, optimizer)


def test_train_step_reduces_loss(rng):
    model = tiny_model()
    batch = make_batch(rng)
    optimizer = build_optimizer(OptimizerConfig(learning_rate=5e-3, warmup_steps=1))
    state = _init_state(model, batch, optimizer)
    loss_fn = make_loss(LossConfig(name="nll", random_velocs=False))
    step = make_train_step(model, loss_fn, optimizer, mesh=None, data_augmentation=False)

    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.5, losses[:3] + losses[-3:]


def test_train_step_multidevice_zero1(rng):
    """Full SPMD step on the virtual 8-device mesh with optimizer-state
    sharding; loss matches the single-device step."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    model = tiny_model()
    batch = make_batch(rng, B=8)
    optimizer = build_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=1))
    state = _init_state(model, batch, optimizer)
    mesh = make_mesh()

    loss_fn = make_loss(LossConfig(name="nll", random_velocs=True))
    step_sharded = make_train_step(
        model, loss_fn, optimizer, mesh=mesh, data_augmentation=True, zero1=True,
        donate=False,
    )
    step_single = make_train_step(
        model, loss_fn, optimizer, mesh=None, data_augmentation=True, donate=False
    )

    sharded_batch = shard_batch(mesh, batch)
    new_sharded, m_sharded = step_sharded(state, sharded_batch, jax.random.PRNGKey(7))
    new_single, m_single = step_single(state, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        float(m_sharded["loss"]), float(m_single["loss"]), rtol=1e-4
    )
    # Parameters evolve identically (replicated params, global-mean grads).
    for a, b in zip(jax.tree.leaves(new_sharded.params), jax.tree.leaves(new_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # At least one optimizer-state leaf is actually sharded over devices.
    def is_sharded(leaf):
        s = getattr(leaf, "sharding", None)
        return s is not None and not s.is_fully_replicated

    assert any(is_sharded(l) for l in jax.tree.leaves(new_sharded.opt_state))


def test_augmentation_preserves_nll_distribution(rng):
    """Translation-augmented batches give identical NLL for this
    translation-invariant model family."""
    model = tiny_model()
    batch = make_batch(rng, B=4)
    params = model.init(
        jax.random.PRNGKey(0),
        batch.atom_types, batch.atom_coords, batch.atom_velocs,
        batch.atom_coord_targets, batch.atom_veloc_targets, batch.masked_elements,
    )
    from timewarp_tpu.utils.geometry import transform_batch

    loss_fn = make_loss(LossConfig(name="nll", random_velocs=False))
    base, _ = loss_fn(model, params, batch, jax.random.PRNGKey(1))
    shifted = transform_batch(jax.random.PRNGKey(2), batch, rotate=False, translate=True)
    moved, _ = loss_fn(model, params, shifted, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(base), float(moved), atol=1e-4)


# ---- geometric loss schedule (reference: GeometricLossSchedule, losses.py:791-943) ----


def test_scheduled_weights_converge_to_uniform():
    """factor<1 with positive pre-softmax weights -> uniform in the limit
    (reference doctest, losses.py:846-858)."""
    from timewarp_tpu.losses import LossScheduleConfig, scheduled_weights

    sched = LossScheduleConfig(every=1, factor=(0.9,))
    w = scheduled_weights((1.0, 10.0), sched, jnp.asarray(100))
    np.testing.assert_allclose(np.asarray(w), [0.5, 0.5], atol=1e-3)
    # at step 0 the weights are softmax of the raw pre-softmax weights
    w0 = scheduled_weights((1.0, 10.0), sched, jnp.asarray(0))
    assert float(w0[1]) > 0.99


def test_scheduled_weights_converge_to_delta():
    """per-loss factor (1, 2) with negative pre-softmax weights -> all mass
    on the first loss (reference doctest, losses.py:860-874)."""
    from timewarp_tpu.losses import LossScheduleConfig, scheduled_weights

    sched = LossScheduleConfig(every=1, factor=(1.0, 2.0))
    w = scheduled_weights((-1.0, -1.0), sched, jnp.asarray(100))
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.0], atol=1e-6)


def test_scheduled_weights_clamped_band():
    """the cumulative factor is clamped to [minimum, maximum], mirroring the
    reference's stop-multiplying-outside-the-band behavior."""
    from timewarp_tpu.losses import LossScheduleConfig, scheduled_weights

    sched = LossScheduleConfig(every=2, factor=(2.0,), maximum=4.0)
    w_late = scheduled_weights((1.0, 3.0), sched, jnp.asarray(1000))
    w_cap = scheduled_weights((4.0, 12.0), sched, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(w_late), np.asarray(w_cap), atol=1e-6)


def test_convex_combination_scheduled_in_train_step(rng):
    """a softmax-weighted NLL+flipped-NLL combination with a geometric
    schedule runs inside the jitted train step and anneals its weights."""
    from timewarp_tpu.losses import (
        LossScheduleConfig,
        convex_combination,
        flipped_nll_loss,
        nll_loss,
    )

    def nll_fn(model, params, batch, rng, step=0):
        return nll_loss(model, params, batch, rng)

    def flip_fn(model, params, batch, rng, step=0):
        return flipped_nll_loss(model, params, batch, rng)

    loss_fn = convex_combination(
        [nll_fn, flip_fn],
        pre_softmax_weights=(0.0, 4.0),
        schedule=LossScheduleConfig(every=1, factor=(0.5,)),
    )
    model = tiny_model()
    batch = make_batch(rng, B=4, V=6)
    optimizer = build_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=2))
    state = _init_state(model, batch, optimizer)
    step = make_train_step(model, loss_fn, optimizer, data_augmentation=False)
    w1_first = None
    for _ in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(3))
        if w1_first is None:
            w1_first = float(metrics["loss_weight_1"])
    assert np.isfinite(float(metrics["loss"]))
    # weight of the second loss decays from ~0.98 toward 0.5
    assert w1_first > 0.9
    assert 0.45 < float(metrics["loss_weight_1"]) < 0.62


def test_acceptance_loss_mixed_molecule_batch():
    """Acceptance-loss train step on a batch mixing two DIFFERENT molecules
    (alanine dipeptide + the 2olx tetrapeptide), the reference's per-protein
    ``segments`` energy batching (reference: losses.py:58-98) redesigned as
    one vmap over a stacked padded system -- and exactness of the stacked
    potential vs per-molecule evaluation."""
    from timewarp_tpu.data.batch import MolDynDatapoint, collate_dense
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.energy import potential_energy
    from timewarp_tpu.physics.losses import MixedEnergyModel
    from timewarp_tpu.physics.provider import batched_mixed_potential, stack_systems

    ad = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    olx = parse_pdb("/root/reference/testdata/output/2olx-traj-state0.pdb")
    sys_ad, _ = build_system(ad)
    sys_olx, _ = build_system(olx)
    stacked = stack_systems([sys_ad, sys_olx])

    # Exactness: stacked/padded energies equal the per-molecule energies.
    coords = jnp.zeros((2, stacked.masses.shape[1], 3))
    coords = coords.at[0, : ad.num_atoms].set(jnp.asarray(ad.positions))
    coords = coords.at[1, : olx.num_atoms].set(jnp.asarray(olx.positions))
    e_mixed = np.asarray(batched_mixed_potential(stacked, coords))
    e_ad = float(potential_energy(sys_ad, jnp.asarray(ad.positions)))
    e_olx = float(potential_energy(sys_olx, jnp.asarray(olx.positions)))
    np.testing.assert_allclose(e_mixed, [e_ad, e_olx], rtol=2e-4)

    def point(topo, name):
        n = topo.num_atoms
        z = np.zeros((n, 3), np.float32)
        return MolDynDatapoint(
            name=name,
            atom_types=topo.atom_types,
            adj_list=topo.bonds.astype(np.int32),
            atom_coords=topo.positions.astype(np.float32),
            atom_velocs=z.copy(),
            atom_forces=z.copy(),
            atom_coord_targets=topo.positions.astype(np.float32),
            atom_veloc_targets=z.copy(),
            atom_force_targets=z.copy(),
        )

    batch = collate_dense([point(ad, "ad"), point(olx, "2olx")])
    # Re-stack padded to the bucketed batch width.
    stacked = stack_systems([sys_ad, sys_olx], v_pad=batch.atom_coords.shape[1])
    model = tiny_model()
    optimizer = build_optimizer(OptimizerConfig(learning_rate=1e-4, warmup_steps=1))
    state = _init_state(model, batch, optimizer)
    loss_fn = make_loss(
        LossConfig(name="acceptance", random_velocs=True, clamp=True),
        energy_model=MixedEnergyModel(),
    )
    step = make_train_step(model, loss_fn, optimizer, mesh=None, data_augmentation=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0), stacked)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_bonded_excess_loss_trains():
    """nll_bonded: the bond+angle excess regularizer computes finite loss,
    exposes its metric, and produces finite grads through the sampler."""
    from timewarp_tpu.data.batch import MolDynDatapoint, collate_dense
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.losses import EnergyModel

    ad = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    sys_ad, _ = build_system(ad)
    n = ad.num_atoms
    z = np.zeros((n, 3), np.float32)
    pt = MolDynDatapoint(
        name="ad", atom_types=ad.atom_types, adj_list=ad.bonds.astype(np.int32),
        atom_coords=ad.positions.astype(np.float32), atom_velocs=z.copy(),
        atom_forces=z.copy(), atom_coord_targets=ad.positions.astype(np.float32),
        atom_veloc_targets=z.copy(), atom_force_targets=z.copy(),
    )
    batch = collate_dense([pt, pt], max_atoms=24)

    model = tiny_model()
    optimizer = build_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=1))
    state = _init_state(model, batch, optimizer)
    loss_fn = make_loss(
        LossConfig(name="nll_bonded", random_velocs=True, weights=(0.7, 0.3)),
        energy_model=EnergyModel(system=sys_ad),
    )
    step = make_train_step(model, loss_fn, optimizer, mesh=None, data_augmentation=False)
    excess0 = None
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["bonded_excess_kT"]))
        if excess0 is None:
            excess0 = float(metrics["bonded_excess_kT"])
    # untrained flow proposals are far off-manifold: excess must be large
    # and positive at init (sanity that the term measures what it claims)
    assert excess0 > 1.0


def test_acceptance_loss_padded_wider_than_system():
    """Single-system acceptance loss on a batch bucketed WIDER than the
    molecule (22 atoms padded to 24): kinetic terms must exclude padding
    rows (regression: round-2 e2e fine-tune crashed on the broadcast)."""
    from timewarp_tpu.data.batch import MolDynDatapoint, collate_dense
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.losses import EnergyModel

    ad = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    sys_ad, _ = build_system(ad)
    n = ad.num_atoms
    z = np.zeros((n, 3), np.float32)
    pt = MolDynDatapoint(
        name="ad", atom_types=ad.atom_types, adj_list=ad.bonds.astype(np.int32),
        atom_coords=ad.positions.astype(np.float32), atom_velocs=z.copy(),
        atom_forces=z.copy(), atom_coord_targets=ad.positions.astype(np.float32),
        atom_veloc_targets=z.copy(), atom_force_targets=z.copy(),
    )
    batch = collate_dense([pt, pt], max_atoms=24)
    assert batch.atom_coords.shape[1] == 24 > n

    model = tiny_model()
    optimizer = build_optimizer(OptimizerConfig(learning_rate=1e-4, warmup_steps=1))
    state = _init_state(model, batch, optimizer)
    loss_fn = make_loss(
        LossConfig(name="acceptance", random_velocs=True, clamp=True),
        energy_model=EnergyModel(system=sys_ad),
    )
    step = make_train_step(model, loss_fn, optimizer, mesh=None, data_augmentation=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
