"""Signature property tests for the conditional flow (mirroring the
reference's invariance pyramid, SURVEY.md section 4.2):

- exact invertibility / likelihood consistency of sampling vs density
- batch-independence: loss(batch) == mean over singleton losses
- translation equivariance: p(Ty|Tx) == p(y|x)
- jit vs eager consistency
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.models.constructor import (
    CustomAttentionTransformerNVPConfig,
    ModelConfig,
    TransformerNVPConfig,
    build_model,
)
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.models.layers.rff import RFFPositionEncoderConfig


def tiny_custom_config(attention_type="kernel", **enc_kwargs):
    enc = dict(
        d_model=16,
        dim_feedforward=32,
        num_heads=2,
        attention_type=attention_type,
        lengthscales=[0.5, 1.0],
    )
    if attention_type == "local":
        enc.update(max_radius=1.0, max_neighbors=8, lengthscales=None)
    if attention_type == "chebyshev_kernel":
        enc.update(cheb_order=8, force_asymptotic_zero=True)
    enc.update(enc_kwargs)
    return ModelConfig(
        model_type="custom_attention_transformer_nvp",
        custom_transformer_nvp_config=CustomAttentionTransformerNVPConfig(
            atom_embedding_dim=8,
            latent_mlp_hidden_dims=(16,),
            num_coupling_layers=2,
            num_transformer_layers=1,
            encoder_layer_config=CustomAttentionEncoderConfig(**enc),
        ),
    )


def tiny_transformer_config(rff=False):
    return ModelConfig(
        model_type="transformer_nvp",
        transformer_nvp_config=TransformerNVPConfig(
            atom_embedding_dim=8,
            transformer_hidden_dim=16,
            latent_mlp_hidden_dims=(16,),
            num_coupling_layers=2,
            num_transformer_layers=1,
            rff_position_encoder_config=(
                RFFPositionEncoderConfig(8, 1.0, 1.0) if rff else None
            ),
        ),
    )


# The flagship kernel family runs in the fast iteration lane; the full
# family sweep is the same guardrail at ~5x the wall time, so it rides the
# slow lane (VERDICT round 2 weak #6: a 13-minute "fast" lane stops being
# used).
FAST_FAMILIES = {"kernel"}
ALL_CONFIGS = [
    pytest.param(
        name,
        cfg,
        id=name,
        marks=() if name in FAST_FAMILIES else (pytest.mark.slow,),
    )
    for name, cfg in [
        ("transformer_nvp", tiny_transformer_config()),
        ("transformer_nvp_rff", tiny_transformer_config(rff=True)),
        ("kernel", tiny_custom_config("kernel")),
        ("learnable_kernel", tiny_custom_config("learnable_kernel")),
        ("chebyshev_kernel", tiny_custom_config("chebyshev_kernel")),
        ("local", tiny_custom_config("local")),
    ]
]


def make_inputs(rng, B=3, V=7, pad=2):
    atom_types = jnp.asarray(rng.integers(0, 5, (B, V)).astype(np.int32))
    x_coords = jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32))
    x_velocs = jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32))
    y_coords = x_coords + 0.1 * jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32))
    y_velocs = jnp.asarray(rng.normal(size=(B, V, 3)).astype(np.float32))
    mask = np.zeros((B, V), dtype=bool)
    if pad:
        mask[0, V - pad:] = True  # first molecule is shorter
    return atom_types, x_coords, x_velocs, y_coords, y_velocs, jnp.asarray(mask)


@pytest.fixture(scope="module")
def nprng():
    return np.random.default_rng(42)


_FLOW_CACHE = {}


def cached_model(name, cfg, nprng):
    """Share one (model, params, inputs) per family across the property
    tests -- model.init dominates each test's wall time and is identical
    for all three."""
    if name not in _FLOW_CACHE:
        model = build_model(cfg)
        inputs = make_inputs(np.random.default_rng(42))
        params = model.init(jax.random.PRNGKey(0), *inputs)
        _FLOW_CACHE[name] = (model, params, inputs)
    return _FLOW_CACHE[name]


@pytest.mark.parametrize("name,cfg", ALL_CONFIGS)
def test_sample_density_consistency(name, cfg, nprng):
    """logp reported by sampling equals log_likelihood of the sample --
    this is the exact-invertibility guarantee of RealNVP."""
    model, params, inputs = cached_model(name, cfg, nprng)
    atom_types, x_coords, x_velocs, y_coords, y_velocs, mask = inputs
    yc, yv, logp = model.apply(
        params,
        jax.random.PRNGKey(1),
        atom_types,
        x_coords,
        x_velocs,
        mask,
        2,
        method="conditional_sample_with_logp",
    )
    for s in range(2):
        ll = model.apply(
            params, atom_types, x_coords, x_velocs, yc[s], yv[s], mask,
            method="log_likelihood",
        )
        np.testing.assert_allclose(np.asarray(ll), np.asarray(logp[s]), atol=2e-3, rtol=1e-4)


def test_tempered_sample_density_consistency(nprng):
    """Tempered proposals (temperature != 1) report the exact density of the
    tempered proposal distribution: sampling logp == log_likelihood at the
    same temperature, and != the untempered likelihood. MH with a tempered
    proposal relies on this exactness (sampling/mh.py make_flow_proposal)."""
    name, cfg = ALL_CONFIGS[0].values[:2]
    model, params, inputs = cached_model(name, cfg, nprng)
    atom_types, x_coords, x_velocs, y_coords, y_velocs, mask = inputs
    tau, tau_v = 0.8, 1.1
    yc, yv, logp = model.apply(
        params,
        jax.random.PRNGKey(1),
        atom_types,
        x_coords,
        x_velocs,
        mask,
        2,
        method="conditional_sample_with_logp",
        temperature=tau,
        veloc_temperature=tau_v,
    )
    for s in range(2):
        ll = model.apply(
            params, atom_types, x_coords, x_velocs, yc[s], yv[s], mask,
            method="log_likelihood", temperature=tau, veloc_temperature=tau_v,
        )
        np.testing.assert_allclose(np.asarray(ll), np.asarray(logp[s]), atol=2e-3, rtol=1e-4)
        ll1 = model.apply(
            params, atom_types, x_coords, x_velocs, yc[s], yv[s], mask,
            method="log_likelihood",
        )
        assert np.abs(np.asarray(ll1) - np.asarray(logp[s])).min() > 1e-3


@pytest.mark.parametrize("name,cfg", ALL_CONFIGS)
def test_batch_independence(name, cfg, nprng):
    """loss(batch) == mean(loss(singletons)) -- catches masking/padding bugs
    (the reference's signature test, tests/test_batching.py:142)."""
    model, params, inputs = cached_model(name, cfg, nprng)
    atom_types, x_coords, x_velocs, y_coords, y_velocs, mask = inputs

    full = model.apply(params, *inputs)
    singles = []
    for i in range(atom_types.shape[0]):
        s = model.apply(
            params,
            atom_types[i : i + 1],
            x_coords[i : i + 1],
            x_velocs[i : i + 1],
            y_coords[i : i + 1],
            y_velocs[i : i + 1],
            mask[i : i + 1],
        )
        singles.append(float(s))
    np.testing.assert_allclose(float(full), np.mean(singles), atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("name,cfg", ALL_CONFIGS)
def test_translation_invariance(name, cfg, nprng):
    """p(Ty|Tx) == p(y|x) for a rigid translation T (COM centering +
    displacement targets; reference: tests/test_distributional_equivariance.py)."""
    model, params, inputs = cached_model(name, cfg, nprng)
    atom_types, x_coords, x_velocs, y_coords, y_velocs, mask = inputs

    ll = model.apply(params, *inputs, method="log_likelihood")
    t = jnp.asarray(np.array([10.0, -3.0, 7.0], dtype=np.float32))
    ll_shift = model.apply(
        params,
        atom_types,
        x_coords + t,
        x_velocs,
        y_coords + t,
        y_velocs,
        mask,
        method="log_likelihood",
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_shift), atol=5e-3)


def test_jit_eager_consistency(nprng):
    cfg = tiny_custom_config("kernel")
    model = build_model(cfg)
    inputs = make_inputs(nprng)
    params = model.init(jax.random.PRNGKey(0), *inputs)
    eager = model.apply(params, *inputs)
    jitted = jax.jit(model.apply)(params, *inputs)
    np.testing.assert_allclose(float(eager), float(jitted), rtol=1e-6)


def test_padding_does_not_change_result(nprng):
    """Adding pure padding atoms must not change likelihoods."""
    cfg = tiny_custom_config("kernel")
    model = build_model(cfg)
    atom_types, x_coords, x_velocs, y_coords, y_velocs, mask = make_inputs(nprng, pad=0)
    params = model.init(
        jax.random.PRNGKey(0), atom_types, x_coords, x_velocs, y_coords, y_velocs, mask
    )
    ll = model.apply(
        params, atom_types, x_coords, x_velocs, y_coords, y_velocs, mask,
        method="log_likelihood",
    )

    def pad(x, extra, fill=0):
        shape = list(x.shape)
        shape[1] = extra
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=1)

    ll_padded = model.apply(
        params,
        pad(atom_types, 3),
        pad(x_coords, 3),
        pad(x_velocs, 3),
        pad(y_coords, 3),
        pad(y_velocs, 3),
        pad(mask, 3, fill=True),
        method="log_likelihood",
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_padded), atol=1e-4)


def test_permutation_invariance(nprng):
    """Relabeling atoms must not change the likelihood (permutation
    equivariance of the attention-based flow; reference:
    equivariance/equivariance_transforms.py Permutation tests)."""
    from timewarp_tpu.data.batch import DenseBatch
    from timewarp_tpu.utils.geometry import permute_batch

    cfg = tiny_custom_config("kernel")
    model = build_model(cfg)
    inputs = make_inputs(nprng, B=2, V=6, pad=0)
    atom_types, x_coords, x_velocs, y_coords, y_velocs, mask = inputs
    params = model.init(jax.random.PRNGKey(0), *inputs)
    ll = model.apply(params, *inputs, method="log_likelihood")

    batch = DenseBatch(
        atom_types=atom_types, atom_coords=x_coords, atom_velocs=x_velocs,
        atom_forces=jnp.zeros_like(x_coords), atom_coord_targets=y_coords,
        atom_veloc_targets=y_velocs, atom_force_targets=jnp.zeros_like(x_coords),
        masked_elements=mask, adj_list=jnp.zeros((2, 2, 2), jnp.int32),
        adj_mask=jnp.zeros((2, 2), bool), names=("a", "b"),
    )
    perm = np.asarray([3, 1, 5, 0, 2, 4])
    pb = permute_batch(batch, perm)
    ll_p = model.apply(
        params, pb.atom_types, pb.atom_coords, pb.atom_velocs,
        pb.atom_coord_targets, pb.atom_veloc_targets, pb.masked_elements,
        method="log_likelihood",
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_p), atol=2e-3, rtol=1e-4)
