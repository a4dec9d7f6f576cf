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
