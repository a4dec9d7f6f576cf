"""Model-zoo tests: every family constructs, trains one step, and respects
the key invariances (batch-independence, CVAE bound ordering, equivariant
rotation invariance)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.losses import LossConfig, make_loss
from timewarp_tpu.models.constructor import (
    EquivariantNVPConfig,
    ModelConfig,
    build_model,
)
from timewarp_tpu.models.cvae import TransformerCVAEConfig
from timewarp_tpu.models.gaussian_density import GaussianDensityTransformerConfig
from timewarp_tpu.models.layers.transformer import TransformerConfig

from tests.test_training import make_batch

TINY_TF = TransformerConfig(n_head=2, dim_feedforward=16)


def zoo_configs():
    return [
        ModelConfig(model_type="initial_state_gaussian"),
        ModelConfig(model_type="learnable_linear_gaussian"),
        ModelConfig(model_type="euler_maruyama_gaussian"),
        ModelConfig(model_type="initial_state_point_estimate"),
        ModelConfig(
            model_type="gaussian_density_transformer",
            gaussian_density_transformer_config=GaussianDensityTransformerConfig(
                atom_embedding_dim=8, latent_dim=16, latent_mlp_hidden_dims=(16,),
                num_transformer_layers=1, transformer_config=TINY_TF,
            ),
        ),
        ModelConfig(
            model_type="transformer_cvae",
            transformer_cvae_config=TransformerCVAEConfig(
                atom_embedding_dim=8, transformer_hidden_dim=16,
                latent_mlp_hidden_dims=(16,), num_transformer_layers=1,
                latent_cvae_dim=4, num_elbo_samples=2, elbo_estimator="elbo",
                transformer_config=TINY_TF,
            ),
        ),
        ModelConfig(
            model_type="equivariant_nvp",
            equivariant_nvp_config=EquivariantNVPConfig(
                atom_embedding_dim=8, num_coupling_layers=2,
                latent_mlp_hidden_dims=(16,),
            ),
        ),
    ]


def _init(model, batch, rng=0):
    args = [batch.atom_types, batch.atom_coords, batch.atom_velocs]
    if getattr(model, "needs_forces", False):
        args.append(batch.atom_forces)
    args += [batch.atom_coord_targets, batch.atom_veloc_targets, batch.masked_elements]
    rngs = {"params": jax.random.PRNGKey(rng)}
    if getattr(model, "needs_latent_rng", False):
        rngs["latent"] = jax.random.PRNGKey(rng + 1)
    return model.init(rngs, *args)


@pytest.mark.parametrize(
    "cfg", zoo_configs(), ids=[c.model_type for c in zoo_configs()]
)
def test_zoo_loss_and_one_train_step(cfg, rng):
    from timewarp_tpu.training.optim import OptimizerConfig, build_optimizer
    from timewarp_tpu.training.train_step import TrainState, make_train_step

    model = build_model(cfg)
    batch = make_batch(rng, B=4, V=6)
    params = _init(model, batch)
    loss_fn = make_loss(LossConfig(name="nll", random_velocs=False))
    l0, _ = loss_fn(model, params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(l0))

    optimizer = build_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=1))
    state = TrainState.create(params, optimizer)
    step = make_train_step(model, loss_fn, optimizer, data_augmentation=False, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize(
    "cfg",
    [c for c in zoo_configs() if c.model_type in (
        "initial_state_gaussian", "gaussian_density_transformer", "equivariant_nvp")],
    ids=lambda c: c.model_type,
)
def test_zoo_batch_independence(cfg, rng):
    model = build_model(cfg)
    batch = make_batch(rng, B=3, V=6)
    params = _init(model, batch)
    loss_fn = make_loss(LossConfig(name="nll", random_velocs=False))
    full, _ = loss_fn(model, params, batch, jax.random.PRNGKey(0))
    singles = [
        float(loss_fn(model, params, batch[i], jax.random.PRNGKey(0))[0])
        for i in range(3)
    ]
    np.testing.assert_allclose(float(full), np.mean(singles), rtol=1e-5, atol=1e-5)


def test_cvae_iwae_at_least_elbo(rng):
    """IWAE_K >= ELBO_K in expectation (reference: tests/test_transformer_cvae.py)."""
    base = TransformerCVAEConfig(
        atom_embedding_dim=8, transformer_hidden_dim=16, latent_mlp_hidden_dims=(16,),
        num_transformer_layers=1, latent_cvae_dim=4, num_elbo_samples=16,
        elbo_estimator="elbo", transformer_config=TINY_TF,
    )
    batch = make_batch(rng, B=4, V=6)
    model_e = build_model(ModelConfig(model_type="transformer_cvae", transformer_cvae_config=base))
    params = _init(model_e, batch)
    cfg_iw = dataclasses.replace(base, elbo_estimator="iwae")
    model_i = build_model(ModelConfig(model_type="transformer_cvae", transformer_cvae_config=cfg_iw))

    def bound(model):
        vals = []
        for s in range(8):
            ll = model.apply(
                params, batch.atom_types, batch.atom_coords, batch.atom_velocs,
                batch.atom_coord_targets, batch.atom_veloc_targets,
                batch.masked_elements, rngs={"latent": jax.random.PRNGKey(s)},
                method="log_likelihood",
            )
            vals.append(np.asarray(ll))
        return np.mean(vals)

    assert bound(model_i) >= bound(model_e) - 0.2


def test_equivariant_nvp_rotation_invariance(rng):
    """p(Ry|Tx) == p(y|x) for random rotations -- the equivariant model's
    signature property (reference: tests/test_distributional_equivariance.py)."""
    from timewarp_tpu.utils.geometry import random_rotation_matrix

    cfg = ModelConfig(
        model_type="equivariant_nvp",
        equivariant_nvp_config=EquivariantNVPConfig(
            atom_embedding_dim=8, num_coupling_layers=2, latent_mlp_hidden_dims=(16,),
        ),
    )
    model = build_model(cfg)
    batch = make_batch(rng, B=2, V=6)
    params = _init(model, batch)

    ll = model.apply(
        params, batch.atom_types, batch.atom_coords, batch.atom_velocs,
        batch.atom_coord_targets, batch.atom_veloc_targets, batch.masked_elements,
        method="log_likelihood",
    )
    R = random_rotation_matrix(jax.random.PRNGKey(3))
    rot = lambda x: jnp.einsum("bvj,ij->bvi", x, R)
    ll_rot = model.apply(
        params, batch.atom_types, rot(batch.atom_coords), rot(batch.atom_velocs),
        rot(batch.atom_coord_targets), rot(batch.atom_veloc_targets),
        batch.masked_elements, method="log_likelihood",
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_rot), atol=5e-3, rtol=1e-4)


def test_equivariant_nvp_invertibility(rng):
    cfg = ModelConfig(
        model_type="equivariant_nvp",
        equivariant_nvp_config=EquivariantNVPConfig(
            atom_embedding_dim=8, num_coupling_layers=2, latent_mlp_hidden_dims=(16,),
        ),
    )
    model = build_model(cfg)
    batch = make_batch(rng, B=2, V=6)
    params = _init(model, batch)
    yc, yv, logp = model.apply(
        params, jax.random.PRNGKey(1), batch.atom_types, batch.atom_coords,
        batch.atom_velocs, batch.masked_elements, 2,
        method="conditional_sample_with_logp",
    )
    ll = model.apply(
        params, batch.atom_types, batch.atom_coords, batch.atom_velocs,
        yc[0], yv[0], batch.masked_elements, method="log_likelihood",
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(logp[0]), atol=2e-3, rtol=1e-4)
