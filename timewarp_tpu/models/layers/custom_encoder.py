"""Position-aware transformer encoder stack.

Reference: modules/layers/custom_attention_encoder.py:24-219 (encoder layer
with pluggable position-dependent self-attention, post-LN, ReLU/GELU FFN)
and modules/layers/custom_transformer_block.py (in-MLP -> encoder stack ->
out-MLP threading positions).

The pairwise-distance matrix is computed once upstream and passed in
(``dists``), replacing the reference's mutable score cache.
"""
import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from timewarp_tpu.models.layers.kernel_attention import (
    KernelAttentionConfig,
    KernelSelfAttention,
)
from timewarp_tpu.models.layers.local_attention import (
    LocalAttentionConfig,
    LocalSelfAttention,
)
from timewarp_tpu.models.layers.mlp import MLP


@dataclasses.dataclass
class CustomAttentionEncoderConfig:
    """Reference: modules/layers/custom_attention_encoder.py:126-137."""

    d_model: int = 128
    dim_feedforward: int = 2048
    num_heads: int = 6
    attention_type: str = "kernel"  # kernel | learnable_kernel | chebyshev_kernel | local
    # Default = the flagship AD-1 recipe (one RBF lengthscale per head,
    # reference: configs/kernel_transformer_nvp.yaml), so ModelConfig() builds
    # the flagship model out of the box.
    lengthscales: Optional[Sequence[float]] = (0.1, 0.2, 0.5, 0.7, 1.0, 1.2)
    normalise_kernel_values: bool = True
    max_radius: Optional[float] = None
    max_neighbors: int = 32
    cheb_order: Optional[int] = None
    force_asymptotic_zero: bool = False
    activation: str = "relu"
    # Fused TPU attention kernel (ops/attention.py). None = shape-gated
    # auto: on only on TPU AND when the molecule has >= PALLAS_MIN_V atoms
    # (kernel_attention.py) -- the kernel pads V to a multiple of 128, so on
    # small molecules the XLA path is ~3.5x faster end-to-end (round-2 A/B).
    use_pallas: "Optional[bool]" = None

    def attention_config(self):
        if self.attention_type == "local":
            assert self.max_radius is not None
            return LocalAttentionConfig(
                num_heads=self.num_heads,
                max_radius=self.max_radius,
                max_neighbors=self.max_neighbors,
            )
        assert self.lengthscales, "kernel attention needs lengthscales"
        return KernelAttentionConfig(
            lengthscales=tuple(self.lengthscales),
            normalise_kernel_values=self.normalise_kernel_values,
            learnable_lengthscales=self.attention_type == "learnable_kernel",
            cheb_order=self.cheb_order if self.attention_type == "chebyshev_kernel" else None,
            force_asymptotic_zero=self.force_asymptotic_zero,
            use_pallas=self.use_pallas,
        )


class CustomEncoderLayer(nn.Module):
    config: CustomAttentionEncoderConfig

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [B, V, d_model]
        dists: jnp.ndarray,  # [B, V, V]
        masked_elements: jnp.ndarray,  # [B, V]
    ) -> jnp.ndarray:
        cfg = self.config
        attn_cfg = cfg.attention_config()
        if isinstance(attn_cfg, LocalAttentionConfig):
            attn = LocalSelfAttention(attn_cfg, cfg.d_model, name="self_attn")
        else:
            attn = KernelSelfAttention(attn_cfg, cfg.d_model, name="self_attn")

        act = nn.relu if cfg.activation == "relu" else nn.gelu
        src2 = attn(src, dists, masked_elements)
        src = nn.LayerNorm()(src + src2)
        src2 = nn.Dense(cfg.d_model)(act(nn.Dense(cfg.dim_feedforward)(src)))
        return nn.LayerNorm()(src + src2)


class _ScanCustomEncoderBody(nn.Module):
    config: CustomAttentionEncoderConfig

    @nn.compact
    def __call__(self, h, dists, masked_elements):
        h = CustomEncoderLayer(self.config, name="layer")(h, dists, masked_elements)
        return h, None


class CustomAttentionTransformerBlock(nn.Module):
    """in-MLP -> position-aware encoder layers -> out-MLP.

    Encoder layers are folded with ``nn.scan`` (one traced body) to keep the
    XLA graph small -- see TransformerBlock for rationale.
    """

    output_dim: int
    mlp_hidden_dims: Sequence[int]
    num_layers: int
    config: CustomAttentionEncoderConfig

    @nn.compact
    def __call__(
        self,
        input_seq: jnp.ndarray,  # [B, V, input_dim]
        dists: jnp.ndarray,  # [B, V, V]
        masked_elements: jnp.ndarray,  # [B, V]
    ) -> jnp.ndarray:
        h = MLP(self.mlp_hidden_dims, self.config.d_model, name="in_mlp")(input_seq)
        stack = nn.scan(
            _ScanCustomEncoderBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
            in_axes=(nn.broadcast, nn.broadcast),
        )(self.config, name="layers")
        h, _ = stack(h, dists, masked_elements)
        return MLP(self.mlp_hidden_dims, self.output_dim, name="out_mlp")(h)
