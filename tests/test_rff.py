import jax
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.models.layers.rff import apply_rff, draw_rff_vectors


def test_rff_approximates_rbf_kernel():
    """feat @ feat.T ~= RBF kernel matrix (reference: tests/test_rff.py)."""
    key = jax.random.PRNGKey(0)
    scale = 1.5
    nsamples = 4096
    # Draw with a near-deterministic scale distribution around `scale`.
    vectors = draw_rff_vectors(key, 3, nsamples, scale_mean=scale, scale_stddev=1e-3)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    feats = apply_rff(x, vectors)
    K_hat = np.asarray(feats @ feats.T)
    d2 = np.asarray(((x[:, None] - x[None]) ** 2).sum(-1))
    K = np.exp(-d2 / (2 * scale**2))
    assert np.abs(K_hat - K).max() < 0.08


def test_rff_zero_dims():
    vectors = draw_rff_vectors(jax.random.PRNGKey(0), 3, 0, 1.0, 1.0)
    x = jnp.ones((5, 3))
    feats = apply_rff(x, vectors)
    assert feats.shape == (5, 0)
