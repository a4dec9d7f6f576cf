"""RealNVP affine coupling layers over (positions, velocities).

Math mirrors the reference's ``NVPCouplingLayer`` (reference:
modules/layers/nvp.py:89-183): the transformed half is scaled+shifted by
nets conditioned on the other half and the input state x; the log-det
Jacobian is the masked sum of log scales. Layer variants:

- ``TransformerCouplingLayer``: stock transformer scale/shift nets over
  concat(atom emb, x coords, x velocs, z-half, RFF(x coords))
  (reference: modules/transformer_nvp.py:13-97).
- ``CustomAttentionCouplingLayer``: kernel/local attention encoders with
  x coords defining locality (reference: modules/custom_transformer_nvp.py:14-93).

All layers are pure functions of (params, inputs, reverse); the shared
conditioning (atom features, centered x, pairwise distances) is packed in a
``Conditioning`` pytree computed once per flow call.
"""
import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from flax import struct

from timewarp_tpu.models.layers.custom_encoder import (
    CustomAttentionEncoderConfig,
    CustomAttentionTransformerBlock,
)
from timewarp_tpu.models.layers.rff import RFFPositionEncoder, RFFPositionEncoderConfig
from timewarp_tpu.models.layers.transformer import TransformerBlock, TransformerConfig


@struct.dataclass
class Conditioning:
    """Per-forward shared context, computed once (functional replacement of
    the reference's cross-layer Cache, reference: utilities/cache.py:159-293)."""

    x_features: jnp.ndarray  # [B, V, D] atom embeddings
    x_coords: jnp.ndarray  # [B, V, 3] COM-centered conditioning coords
    x_velocs: jnp.ndarray  # [B, V, 3]
    masked_elements: jnp.ndarray  # [B, V] bool
    dists: jnp.ndarray  # [B, V, V] pairwise distances of x_coords


def masked_logdet(scale_log: jnp.ndarray, masked_elements: jnp.ndarray) -> jnp.ndarray:
    """Sum log-scales over real atoms and xyz: [B, V, 3] -> [B]."""
    return jnp.where(masked_elements[:, :, None], 0.0, scale_log).sum(axis=(-1, -2))


class CouplingLayerBase(nn.Module):
    """Affine coupling: subclasses implement scale_and_shift()."""

    transformed_vars: str  # "positions" | "velocities"

    def scale_and_shift(self, z_coords, z_velocs, cond: Conditioning):
        raise NotImplementedError

    def __call__(
        self,
        z_coords: jnp.ndarray,  # [B, V, 3]
        z_velocs: jnp.ndarray,  # [B, V, 3]
        cond: Conditioning,
        reverse: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (z_coords, z_velocs, logdet) with logdet the masked sum of
        log scales (positive sense: log p_y = log p_z + sum over layers)."""
        log_scale, shift = self.scale_and_shift(z_coords, z_velocs, cond)
        logdet = masked_logdet(log_scale, cond.masked_elements)
        scale = jnp.exp(log_scale)

        if not reverse:  # density mode, y -> z
            if self.transformed_vars == "positions":
                z_coords = z_coords * scale + shift
            else:
                z_velocs = z_velocs * scale + shift
        else:  # sampling mode, z -> y
            if self.transformed_vars == "positions":
                z_coords = (z_coords - shift) / scale
            else:
                z_velocs = (z_velocs - shift) / scale

        return z_coords, z_velocs, logdet

    def _untransformed_input(self, z_coords, z_velocs, cond: Conditioning):
        z_half = z_velocs if self.transformed_vars == "positions" else z_coords
        return jnp.concatenate(
            [cond.x_features, cond.x_coords, cond.x_velocs, z_half], axis=-1
        )


class TransformerCouplingLayer(CouplingLayerBase):
    latent_dim: int = 128
    mlp_hidden_dims: Sequence[int] = (256,)
    num_transformer_layers: int = 3
    transformer_config: TransformerConfig = dataclasses.field(
        default_factory=TransformerConfig
    )
    rff_config: RFFPositionEncoderConfig = dataclasses.field(
        default_factory=RFFPositionEncoderConfig
    )

    @nn.compact
    def scale_and_shift(self, z_coords, z_velocs, cond: Conditioning):
        inp = self._untransformed_input(z_coords, z_velocs, cond)
        enc = RFFPositionEncoder(self.rff_config, name="position_encoder")(cond.x_coords)
        inp = jnp.concatenate([inp, enc], axis=-1)

        def block(name):
            return TransformerBlock(
                output_dim=3,
                latent_dim=self.latent_dim,
                mlp_hidden_dims=self.mlp_hidden_dims,
                num_layers=self.num_transformer_layers,
                config=self.transformer_config,
                name=name,
            )

        log_scale = block("scale_net")(inp, cond.masked_elements)
        shift = block("shift_net")(inp, cond.masked_elements)
        return log_scale, shift


class CouplingPair(nn.Module):
    """One (positions, velocities) pair of coupling layers -- the repeating
    unit of the RealNVP stack. All pairs are structurally identical, so the
    full chain is a ``nn.scan`` over pairs: XLA traces ONE pair body instead
    of the whole unrolled stack (compile-time critical for deep flows).

    ``layer_factory(transformed_vars, name)`` builds one coupling layer; the
    pair applies (first, second) in density mode and (second, first) with
    inverted transforms in sampling mode, preserving exact invertibility.
    """

    layer_factory: "callable" = None
    first_transformed: str = "positions"

    @nn.compact
    def __call__(self, carry, cond: Conditioning, reverse: bool = False):
        z_coords, z_velocs, logdet = carry
        second_transformed = (
            "velocities" if self.first_transformed == "positions" else "positions"
        )
        layer_a = self.layer_factory(self.first_transformed, "a")
        layer_b = self.layer_factory(second_transformed, "b")
        for layer in (layer_a, layer_b) if not reverse else (layer_b, layer_a):
            z_coords, z_velocs, ld = layer(z_coords, z_velocs, cond, reverse=reverse)
            logdet = logdet + ld
        return (z_coords, z_velocs, logdet), None


def make_pair_stack(num_pairs: int, reverse: bool):
    """nn.scan transform over CouplingPair. ``reverse=True`` runs the pairs
    (and their stacked parameters) in reverse order for sampling mode; both
    directions share parameters because the transformed module is
    instantiated under the same name."""
    return nn.scan(
        CouplingPair,
        variable_axes={"params": 0, "buffers": 0},
        split_rngs={"params": True},
        length=num_pairs,
        in_axes=(nn.broadcast, nn.broadcast),
        reverse=reverse,
    )


class PairChain(nn.Module):
    """The full coupling chain as a scanned stack of CouplingPairs.

    A compact wrapper so the direction-specific scan transform can be
    instantiated per call (under one shared parameter scope "pairs") while
    the parent flow module stays setup-style.
    """

    layer_factory: "callable"
    num_pairs: int
    first_transformed: str = "positions"

    @nn.compact
    def __call__(self, z_coords, z_velocs, cond: Conditioning, reverse: bool = False):
        stack = make_pair_stack(self.num_pairs, reverse=reverse)(
            layer_factory=self.layer_factory,
            first_transformed=self.first_transformed,
            name="pairs",
        )
        logdet0 = jnp.zeros(z_coords.shape[0], dtype=z_coords.dtype)
        (z_coords, z_velocs, logdet), _ = stack((z_coords, z_velocs, logdet0), cond, reverse)
        return z_coords, z_velocs, logdet


class CustomAttentionCouplingLayer(CouplingLayerBase):
    encoder_config: CustomAttentionEncoderConfig = dataclasses.field(
        default_factory=CustomAttentionEncoderConfig
    )
    mlp_hidden_dims: Sequence[int] = (256,)
    num_transformer_layers: int = 3
    separate_scales_per_dimension: bool = True

    @nn.compact
    def scale_and_shift(self, z_coords, z_velocs, cond: Conditioning):
        inp = self._untransformed_input(z_coords, z_velocs, cond)

        def block(name, out_dim):
            return CustomAttentionTransformerBlock(
                output_dim=out_dim,
                mlp_hidden_dims=self.mlp_hidden_dims,
                num_layers=self.num_transformer_layers,
                config=self.encoder_config,
                name=name,
            )

        scale_dim = 3 if self.separate_scales_per_dimension else 1
        log_scale = block("scale_net", scale_dim)(inp, cond.dists, cond.masked_elements)
        if not self.separate_scales_per_dimension:
            log_scale = jnp.repeat(log_scale, 3, axis=-1)
        shift = block("shift_net", 3)(inp, cond.dists, cond.masked_elements)
        return log_scale, shift
