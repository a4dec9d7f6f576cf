import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.models.layers.kernel_attention import (
    chebyshev_basis,
    chebyshev_expansion,
    gaussian_basis,
    kernel_attention_scores,
    pairwise_distances,
    CHEB_COEFFS_EXPMX,
)


def test_pairwise_distances_match_numpy(rng):
    x = rng.normal(size=(2, 7, 3)).astype(np.float32)
    d = np.asarray(pairwise_distances(jnp.asarray(x)))
    ref = np.linalg.norm(x[:, :, None, :] - x[:, None, :, :], axis=-1)
    # The MXU-friendly squared-norm expansion loses ~1e-3 absolute accuracy
    # near zero distance (f32 cancellation) -- negligible against the
    # smallest kernel lengthscale (0.1 nm).
    np.testing.assert_allclose(d, ref, atol=2e-3)


def test_scores_normalised_sum_to_one(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
    mask = jnp.asarray(np.array([[False] * 4 + [True] * 2, [False] * 6]))
    d = pairwise_distances(x)
    scores = kernel_attention_scores(d, mask, jnp.array([0.5, 1.0]), normalise=True)
    # Masked keys contribute zero.
    assert np.all(np.asarray(scores)[0, :, :, 4:] == 0)
    # Rows over real keys sum to ~1 (up to the +1e-5 regulariser).
    sums = np.asarray(scores.sum(-1))
    np.testing.assert_allclose(sums[:, :, :4], 1.0, atol=1e-3)


def test_unnormalised_scores_are_gaussian(rng):
    x = jnp.asarray(rng.normal(size=(1, 5, 3)).astype(np.float32))
    mask = jnp.zeros((1, 5), dtype=bool)
    d = pairwise_distances(x)
    ls = jnp.array([0.7])
    scores = kernel_attention_scores(d, mask, ls, normalise=False)
    expected = np.exp(-((np.asarray(d) / 0.7) ** 2))
    np.testing.assert_allclose(np.asarray(scores[0, 0]), expected[0], atol=1e-5)


def test_chebyshev_expansion_values():
    # R_n(x) = T_n((x-1)/(x+1)); check against explicit cos(n*arccos(t)).
    x = jnp.asarray(np.linspace(0.1, 5.0, 13, dtype=np.float32))
    order = 6
    exp = np.asarray(chebyshev_expansion(x, order))
    t = (np.asarray(x) - 1) / (np.asarray(x) + 1)
    for n in range(order):
        ref = np.cos(n * np.arccos(np.clip(t, -1, 1)))
        np.testing.assert_allclose(exp[n], ref, atol=1e-4)


def test_chebyshev_approximates_exp(rng):
    """The 32-coefficient expansion of exp(-x) applied to squared scaled
    distances approximates the Gaussian basis (reference parity test:
    tests/test_kernel_attention.py in the upstream repo)."""
    scaled = jnp.asarray(np.abs(rng.normal(size=(1, 1, 9, 9))).astype(np.float32) * 2)
    coeffs = jnp.asarray(CHEB_COEFFS_EXPMX)[None, :]
    approx = chebyshev_basis(scaled, coeffs, force_asymptotic_zero=False)
    exact = gaussian_basis(scaled)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(exact), atol=1e-4)


def test_force_asymptotic_zero_centering():
    scaled = jnp.full((1, 1, 2, 2), 1e3, dtype=jnp.float32)  # x -> inf
    coeffs = jnp.asarray(CHEB_COEFFS_EXPMX)[None, :]
    val = chebyshev_basis(scaled, coeffs, force_asymptotic_zero=True)
    # At infinity all R_n -> 1, so the centred coefficients sum to 0.
    np.testing.assert_allclose(np.asarray(val), 0.0, atol=1e-4)


def test_use_pallas_shape_gate():
    """The auto gate keeps small molecules on the XLA path (the round-2 3.5x
    MH regression), enables Pallas only for large-V on TPU, and explicit
    True/False always wins."""
    from timewarp_tpu.models.layers.kernel_attention import (
        PALLAS_MIN_V,
        resolve_use_pallas,
    )

    # Auto on TPU: shape-gated.
    assert not resolve_use_pallas(None, 22, backend="tpu")
    assert not resolve_use_pallas(None, PALLAS_MIN_V - 1, backend="tpu")
    assert resolve_use_pallas(None, PALLAS_MIN_V, backend="tpu")
    assert resolve_use_pallas(None, 2000, backend="axon")
    # Auto on CPU: always off (Pallas TPU kernels need the interpreter).
    assert not resolve_use_pallas(None, 2000, backend="cpu")
    # Explicit overrides win over the gate.
    assert resolve_use_pallas(True, 22, backend="cpu")
    assert not resolve_use_pallas(False, 2000, backend="tpu")
