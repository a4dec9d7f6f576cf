"""Random Fourier feature position encoding of 3-D coordinates.

Reference: modules/layers/rff_position_encoder.py:86-137. The frequency
vectors are drawn once at init with Gamma-distributed RBF scales and frozen
(stored as a flax variable in a non-trainable collection so they persist in
checkpoints but receive no gradient).
"""
import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class RFFPositionEncoderConfig:
    encoding_dim: int = 0  # must be even; 0 disables the encoding
    scale_mean: float = 1.0
    scale_stddev: float = 1.0


def gamma_shape_rate(mean: float, stddev: float):
    rate = mean / (stddev**2)
    shape = mean * rate
    return shape, rate


def draw_rff_vectors(
    key: jax.Array, ndim: int, nsamples: int, scale_mean: float, scale_stddev: float
) -> jnp.ndarray:
    """[ndim, nsamples] Gaussian frequency vectors with per-sample RBF
    scales drawn from a Gamma(mean, stddev) distribution."""
    if nsamples == 0:
        return jnp.zeros((ndim, 0), dtype=jnp.float32)
    k1, k2 = jax.random.split(key)
    shape, rate = gamma_shape_rate(scale_mean, scale_stddev)
    scales = jax.random.gamma(k1, shape, (nsamples,)) / rate  # [S]
    g = jax.random.normal(k2, (ndim, nsamples))
    return (g / scales[None, :]).astype(jnp.float32)


def apply_rff(coords: jnp.ndarray, vectors: jnp.ndarray) -> jnp.ndarray:
    """[..., ndim] coords -> [..., 2*nsamples] features; feat @ feat.T
    approximates the RBF kernel matrix."""
    nsamples = vectors.shape[1]
    ips = coords @ vectors
    if nsamples == 0:
        return ips
    return math.sqrt(1.0 / nsamples) * jnp.concatenate(
        [jnp.cos(ips), jnp.sin(ips)], axis=-1
    )


class RFFPositionEncoder(nn.Module):
    config: RFFPositionEncoderConfig
    position_dim: int = 3

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        assert cfg.encoding_dim % 2 == 0, "encoding_dim must be even"
        nsamples = cfg.encoding_dim // 2

        def init_fn():
            return draw_rff_vectors(
                self.make_rng("params"),
                self.position_dim,
                nsamples,
                cfg.scale_mean,
                cfg.scale_stddev,
            )

        vectors = self.variable("buffers", "rff_vectors", init_fn)
        return apply_rff(coords, vectors.value)
