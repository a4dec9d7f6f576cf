"""Fused Pallas attention vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import timewarp_tpu.ops.attention as A


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """CPU tests run the kernel in the Pallas interpreter."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(A.pl, "pallas_call", patched)


def _case(rng, B=2, V=16, H=3, D=8, pad=3):
    x = rng.normal(size=(B, V, 3)).astype(np.float32)
    dists = np.linalg.norm(x[:, :, None] - x[:, None, :], axis=-1)
    values = rng.normal(size=(B, V, H, D)).astype(np.float32)
    mask = np.zeros((B, V), bool)
    mask[0, V - pad:] = True
    ls = np.array([0.3, 0.7, 1.1], dtype=np.float32)[:H]
    return jnp.asarray(dists), jnp.asarray(values), jnp.asarray(mask), jnp.asarray(ls)


@pytest.mark.parametrize("normalise", [True, False])
def test_fused_matches_reference(rng, normalise):
    dists, values, mask, ls = _case(rng)
    out = A.fused_kernel_attention(dists, values, mask, ls, normalise)
    ref = A.xla_reference(dists, values, mask, ls, normalise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_gradients_match_reference(rng):
    dists, values, mask, ls = _case(rng, B=1, V=8, H=2, D=4, pad=0)

    def loss_fused(d, v, l):
        return (A.fused_kernel_attention(d, v, mask, l, True) ** 2).sum()

    def loss_ref(d, v, l):
        return (A.xla_reference(d, v, mask, l, True) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(dists, values, ls)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(dists, values, ls)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_fused_tiled_large_v(rng):
    """V > 128 exercises the query-block tiling (multiple grid cells per
    head); padded to 2 q-blocks of 128."""
    dists, values, mask, ls = _case(rng, B=1, V=200, H=2, D=8, pad=11)
    out = A.fused_kernel_attention(dists, values, mask, ls, True)
    ref = A.xla_reference(dists, values, mask, ls, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_fused_gradients_large_v(rng):
    """Fused Pallas backward (dd/dv/dls) vs autodiff through the XLA
    reference, across a tile boundary and with padding."""
    dists, values, mask, ls = _case(rng, B=2, V=140, H=2, D=8, pad=7)

    def loss_fused(d, v, l):
        return (A.fused_kernel_attention(d, v, mask, l, True) ** 2).sum()

    def loss_ref(d, v, l):
        return (A.xla_reference(d, v, mask, l, True) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(dists, values, ls)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(dists, values, ls)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("normalise", [True, False])
def test_fused_gradients_unnormalised(rng, normalise):
    dists, values, mask, ls = _case(rng, B=1, V=10, H=3, D=4, pad=2)

    def loss_fused(d, v, l):
        return (A.fused_kernel_attention(d, v, mask, l, normalise) ** 2).sum()

    def loss_ref(d, v, l):
        return (A.xla_reference(d, v, mask, l, normalise) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(dists, values, ls)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(dists, values, ls)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("force_zero", [False, True])
def test_fused_chebyshev_matches_reference(rng, force_zero):
    from timewarp_tpu.models.layers.kernel_attention import CHEB_COEFFS_EXPMX

    dists, values, mask, ls = _case(rng, B=2, V=12, H=3, D=8, pad=3)
    coeffs = jnp.tile(jnp.asarray(CHEB_COEFFS_EXPMX[:8])[None], (3, 1))
    if force_zero:
        coeffs = coeffs - coeffs.mean(axis=1, keepdims=True)
    out = A.fused_chebyshev_attention(dists, values, mask, ls, coeffs, True)
    ref = A.xla_reference(dists, values, mask, ls, True, cheb_coeffs=coeffs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_fused_chebyshev_gradients(rng):
    from timewarp_tpu.models.layers.kernel_attention import CHEB_COEFFS_EXPMX

    dists, values, mask, ls = _case(rng, B=1, V=9, H=2, D=4, pad=2)
    coeffs = jnp.tile(jnp.asarray(CHEB_COEFFS_EXPMX[:6])[None], (2, 1))

    def loss_fused(d, v, l, c):
        return (A.fused_chebyshev_attention(d, v, mask, l, c, True) ** 2).sum()

    def loss_ref(d, v, l, c):
        return (A.xla_reference(d, v, mask, l, True, cheb_coeffs=c) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(dists, values, ls, coeffs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(dists, values, ls, coeffs)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
