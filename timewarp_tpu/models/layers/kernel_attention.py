"""Kernel attention in coordinate space.

Attention scores are a stationary kernel of pairwise 3-D atom distances --
no learned queries/keys at all. Semantics mirror the reference
(reference: modules/layers/kernel_attention.py:69-121 for the score math,
:124-139 for value attention, :217-252 and :255-339 for the learnable
lengthscale / Chebyshev-rational variants).

TPU-first structure: the pairwise distance matrix is the only piece shared
across coupling layers, so it is computed ONCE per flow forward and threaded
through explicitly (replacing the reference's mutable ``Cache``,
reference: model_constructor.py:188-196, utilities/cache.py). Each layer
then applies its own cheap elementwise basis + normalization. For the fixed
"kernel" variant this is bit-identical to the reference's cross-layer score
cache (all layers share the same constant lengthscales); for the learnable
variants each layer uses its *own* lengthscales, where the reference
silently reused the first layer's cached scores.
"""
import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# Chebyshev-rational expansion coefficients of exp(-x) on [0, inf), by
# numerical quadrature (reference: modules/layers/kernel_attention.py:292-325).
CHEB_COEFFS_EXPMX = np.array(
    [
        4.275836e-01, -5.464240e-01, 7.106222e-02, 5.473271e-02,
        5.744192e-03, -7.926410e-03, -5.392865e-03, -1.210823e-03,
        6.996851e-04, 8.686655e-04, 4.459163e-04, 7.084817e-05,
        -9.620444e-05, -1.110469e-04, -6.551055e-05, -1.875292e-05,
        7.930955e-06, 1.553729e-05, 1.246072e-05, 6.282442e-06,
        1.216243e-06, -1.468327e-06, -2.141963e-06, -1.694741e-06,
        -9.063254e-07, -2.337215e-07, 1.609271e-07, 2.978384e-07,
        2.700519e-07, 1.730454e-07, 7.272222e-08, 1.192814e-09,
    ],
    dtype=np.float32,
)


def pairwise_distances(
    x: jnp.ndarray, y: Optional[jnp.ndarray] = None, eps: float = 1e-12
) -> jnp.ndarray:
    """Euclidean cdist via the squared-norm expansion (one MXU matmul),
    [B, V, D] x [B, W, D] -> [B, V, W]."""
    y = x if y is None else y
    x2 = (x * x).sum(-1)  # [B, V]
    y2 = (y * y).sum(-1)  # [B, W]
    xy = jnp.einsum("bvd,bwd->bvw", x, y)
    sq = x2[:, :, None] + y2[:, None, :] - 2.0 * xy
    return jnp.sqrt(jnp.maximum(sq, eps))


def gaussian_basis(scaled: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(-(scaled**2))


def chebyshev_expansion(x: jnp.ndarray, order: int) -> jnp.ndarray:
    """Chebyshev rational basis R_n(x) = T_n((x-1)/(x+1)) via the stable
    three-term recursion; stacks order terms on a new leading axis."""
    assert order >= 1
    r = (x - 1.0) / (x + 1.0)
    terms = [jnp.ones_like(x)]
    if order >= 2:
        terms.append(r)
    prev, cur = terms[0], r
    for _ in range(2, order):
        nxt = 2.0 * r * cur - prev
        terms.append(nxt)
        prev, cur = cur, nxt
    return jnp.stack(terms[:order], axis=0)  # [order, ...]


def chebyshev_basis(
    scaled: jnp.ndarray,  # [B, H, V, W] distances / lengthscale
    coeffs: jnp.ndarray,  # [H, order]
    force_asymptotic_zero: bool,
) -> jnp.ndarray:
    if force_asymptotic_zero:
        coeffs = coeffs - coeffs.mean(axis=1, keepdims=True)
    cheb = chebyshev_expansion(scaled**2, coeffs.shape[1])  # [C, B, H, V, W]
    return jnp.einsum("cbhvw,hc->bhvw", cheb, coeffs)


def kernel_attention_scores(
    dists: jnp.ndarray,  # [B, V, W]
    masked_elements: jnp.ndarray,  # [B, W] bool, True = padding
    lengthscales: jnp.ndarray,  # [H]
    normalise: bool = True,
    cheb_coeffs: Optional[jnp.ndarray] = None,  # [H, order] -> Chebyshev basis
    force_asymptotic_zero: bool = False,
) -> jnp.ndarray:  # [B, H, V, W]
    scaled = dists[:, None, :, :] / lengthscales[None, :, None, None]
    if cheb_coeffs is not None:
        scores = chebyshev_basis(scaled, cheb_coeffs, force_asymptotic_zero)
    else:
        scores = gaussian_basis(scaled)
    scores = jnp.where(masked_elements[:, None, None, :], 0.0, scores)
    if normalise:
        scores = scores / (jnp.abs(scores).sum(axis=-1, keepdims=True) + 1e-5)
    return scores


# Minimum (unpadded) atom count at which the auto use_pallas gate enables the
# fused kernel. Below this, the XLA einsum path is faster end-to-end: Pallas
# pads V to a multiple of 128 and the round-2 A/B on the real chip measured
# 18,782 proposals/s (XLA) vs 5,312 (Pallas) for a V=22 dipeptide.
PALLAS_MIN_V = 256


def resolve_use_pallas(configured, num_atoms, backend=None):
    """Resolve the use_pallas tri-state: explicit True/False wins; None is
    the shape-gated auto default (TPU backend AND num_atoms >= PALLAS_MIN_V).
    """
    if configured is not None:
        return configured
    if backend is None:
        import jax

        backend = jax.default_backend()
    return backend not in ("cpu",) and num_atoms >= PALLAS_MIN_V


@dataclasses.dataclass
class KernelAttentionConfig:
    lengthscales: Sequence[float]  # one per head
    normalise_kernel_values: bool = True
    learnable_lengthscales: bool = False
    cheb_order: Optional[int] = None  # set -> Chebyshev-rational basis
    force_asymptotic_zero: bool = False
    # Use the fused Pallas TPU kernels (ops/attention.py): scores never
    # materialize in HBM (Gaussian and Chebyshev bases; learnable
    # lengthscales supported -- gradients flow through the fused backward).
    # None (default) = shape-gated auto: on only when running on TPU AND the
    # molecule is large enough that the fused kernel wins. The Pallas path
    # pads V up to a multiple of 128, so a 22-atom dipeptide would do ~28x
    # the attention arithmetic and lose XLA fusion around each call --
    # measured 3.5x end-to-end MH slowdown (18.8k -> 5.3k proposals/s).
    # Explicit True/False always wins over the auto gate.
    use_pallas: "Optional[bool]" = None

    @property
    def num_heads(self) -> int:
        return len(self.lengthscales)


class KernelSelfAttention(nn.Module):
    """values projection + kernel attention over shared atom positions
    (reference: modules/layers/kernel_self_attention.py:12-48 composed with
    KernelAttention.forward at kernel_attention.py:185-214).

    value_dim per head equals d_model, matching the reference constructor
    (custom_attention_encoder.py:169-183).
    """

    config: KernelAttentionConfig
    d_model: int

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [B, V, d_model]
        dists: jnp.ndarray,  # [B, V, V] precomputed pairwise distances
        masked_elements: jnp.ndarray,  # [B, V]
    ) -> jnp.ndarray:
        cfg = self.config
        H = cfg.num_heads
        init_ls = jnp.asarray(np.asarray(cfg.lengthscales, dtype=np.float32))

        if cfg.learnable_lengthscales or cfg.cheb_order is not None:
            log_ls = self.param("log_lengthscales", lambda _: jnp.log(init_ls))
            lengthscales = jnp.exp(log_ls)
        else:
            lengthscales = init_ls

        cheb_coeffs = None
        if cfg.cheb_order is not None:
            order = cfg.cheb_order
            base = np.zeros((order,), dtype=np.float32)
            take = min(order, len(CHEB_COEFFS_EXPMX))
            base[:take] = CHEB_COEFFS_EXPMX[:take]
            cheb_coeffs = self.param(
                "cheb_coeffs", lambda _: jnp.tile(jnp.asarray(base)[None, :], (H, 1))
            )

        values = nn.Dense(H * self.d_model, use_bias=False, name="values")(src)
        values = values.reshape(src.shape[0], src.shape[1], H, self.d_model)

        # Shape gate: the fused kernel pads V to a multiple of 128 and
        # breaks XLA's fusion of the surrounding elementwise ops, so it only
        # wins once the true [V, V] score tile is MXU-sized (crossover around
        # V ~ 256 on a v5e chip; at V >= 512 the Pallas forward matches or
        # beats XLA while never materializing [B,H,V,V] in HBM).
        use_pallas = resolve_use_pallas(cfg.use_pallas, src.shape[1])
        if use_pallas and cheb_coeffs is None:
            from timewarp_tpu.ops.attention import fused_kernel_attention

            attended = fused_kernel_attention(
                dists, values, masked_elements, lengthscales,
                cfg.normalise_kernel_values,
            )  # [B, V, H, D]
        elif use_pallas:
            from timewarp_tpu.ops.attention import fused_chebyshev_attention

            coeffs = cheb_coeffs
            if cfg.force_asymptotic_zero:
                # Center OUTSIDE the kernel so the coefficient gradient flows
                # through the centering via ordinary autodiff.
                coeffs = coeffs - coeffs.mean(axis=1, keepdims=True)
            attended = fused_chebyshev_attention(
                dists, values, masked_elements, lengthscales, coeffs,
                cfg.normalise_kernel_values,
            )
        else:
            scores = kernel_attention_scores(
                dists,
                masked_elements,
                lengthscales,
                normalise=cfg.normalise_kernel_values,
                cheb_coeffs=cheb_coeffs,
                force_asymptotic_zero=cfg.force_asymptotic_zero,
            )  # [B, H, V, V]
            attended = jnp.einsum("bhvw,bwhd->bvhd", scores, values)

        attended = attended.reshape(src.shape[0], src.shape[1], H * self.d_model)
        return nn.Dense(self.d_model, use_bias=False, name="out")(attended)
