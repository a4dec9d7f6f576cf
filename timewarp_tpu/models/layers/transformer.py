"""Stock transformer encoder over atom sequences.

Semantics match the reference's ``TransformerBlock`` wrapping
``nn.TransformerEncoder`` (reference: modules/layers/transformer_block.py:18-72):
post-layer-norm encoder layers with ReLU feed-forward and key-padding
masking, sandwiched between input/output SiLU MLPs. Implemented directly
with einsum attention so the padding-mask semantics are explicit and the
whole block fuses under XLA.
"""
import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from timewarp_tpu.models.layers.mlp import MLP

# Large negative filler for masked attention logits; avoids -inf NaN edge
# cases while being exp-negligible in f32 softmax.
MASK_FILL = -1e9


@dataclasses.dataclass
class TransformerConfig:
    """Reference: modules/layers/transformer_block.py:11-15."""

    n_head: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.0  # dropout makes the likelihood stochastic; keep 0


class MultiHeadSelfAttention(nn.Module):
    """Standard scaled-dot-product self-attention with key-padding mask."""

    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, masked_elements: jnp.ndarray) -> jnp.ndarray:
        # x: [B, V, D]; masked_elements: [B, V] bool, True = padding.
        d_model = x.shape[-1]
        assert d_model % self.num_heads == 0
        head_dim = d_model // self.num_heads

        qkv = nn.Dense(3 * d_model, name="qkv")(x)  # [B, V, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, head_dim)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, x.dtype)
        )
        logits = jnp.where(masked_elements[:, None, None, :], MASK_FILL, logits)
        weights = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(x.shape[0], x.shape[1], d_model)
        return nn.Dense(d_model, name="out")(out)


class EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (attention -> add&norm -> FFN ->
    add&norm), ReLU activation."""

    num_heads: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, masked_elements: jnp.ndarray) -> jnp.ndarray:
        attn = MultiHeadSelfAttention(self.num_heads)(x, masked_elements)
        x = nn.LayerNorm()(x + attn)
        ff = nn.Dense(x.shape[-1])(nn.relu(nn.Dense(self.dim_feedforward)(x)))
        return nn.LayerNorm()(x + ff)


class _ScanEncoderBody(nn.Module):
    """EncoderLayer adapted to lax.scan carry semantics."""

    num_heads: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, h, masked_elements):
        h = EncoderLayer(self.num_heads, self.dim_feedforward, name="layer")(
            h, masked_elements
        )
        return h, None


class TransformerBlock(nn.Module):
    """in-MLP -> encoder stack -> out-MLP over an atom sequence.

    The (identical) encoder layers are folded with ``nn.scan`` so XLA traces
    ONE layer body regardless of depth -- compile time for the 96-layer
    flagship flow drops by an order of magnitude versus unrolling, at
    negligible steady-state cost (the layers are sequential either way).
    """

    output_dim: int
    latent_dim: int
    mlp_hidden_dims: Sequence[int]
    num_layers: int
    config: TransformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, masked_elements: jnp.ndarray) -> jnp.ndarray:
        h = MLP(self.mlp_hidden_dims, self.latent_dim, name="in_mlp")(x)
        stack = nn.scan(
            _ScanEncoderBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
            in_axes=(nn.broadcast,),
        )(self.config.n_head, self.config.dim_feedforward, name="layers")
        h, _ = stack(h, masked_elements)
        return MLP(self.mlp_hidden_dims, self.output_dim, name="out_mlp")(h)
