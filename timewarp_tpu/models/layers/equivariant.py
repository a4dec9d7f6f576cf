"""SO(3)-equivariant coupling layer.

Reference: modules/layers/dense_equivariant_coupling_layer.py:16-486,
equivariant_features_basis.py:10-180, feature_processor.py, and
modules/dense_equivariant_nvp.py:8-68.

Shifts are built as invariant-coefficient combinations of equivariant basis
vectors (relative displacements of x and of the untransformed z half, plus
the velocity vectors); scales are pure invariants (isotropic, repeated over
xyz). Features are processed with a dense EGNN-like pass: per-pair MLP over
(h_i, h_j, invariant pair features) -> masked mean over j -> pointwise MLP.
"""
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from timewarp_tpu.models.layers.mlp import MLP
from timewarp_tpu.models.nvp import Conditioning, CouplingLayerBase


def _norm(x, axis=-1, keepdims=True, eps=1e-12):
    return jnp.sqrt((x * x).sum(axis=axis, keepdims=keepdims) + eps)


def equivariant_basis(transformed_vars: str, z_coords, z_velocs, cond: Conditioning):
    """Invariant features + equivariant basis vectors.

    positions-transforming layers condition on the z *velocities*
    (velocity basis, reference: equivariant_features_basis.py:118-180);
    velocities-transforming layers condition on the z *coordinates*
    (coord basis, :48-115).

    Returns (rel_features [B,V,V,Fr], pointwise_features [B,V,Fp],
             rel_basis [B,V,V,Kr,3], pointwise_basis [B,V,Kp,3]).
    """
    x, v, feats = cond.x_coords, cond.x_velocs, cond.x_features
    x_rel = x[:, :, None, :] - x[:, None, :, :]  # [B, V, V, 3]
    x_rel_norm = _norm(x_rel)

    if transformed_vars == "positions":
        z_v = z_velocs
        rel_features = x_rel_norm  # [B, V, V, 1]
        pointwise_features = jnp.concatenate([feats, _norm(z_v), _norm(v)], axis=-1)
        rel_basis = x_rel[:, :, :, None, :]  # [B, V, V, 1, 3]
        pointwise_basis = jnp.stack([z_v, v], axis=-2)  # [B, V, 2, 3]
    else:
        z_c = z_coords
        z_rel = z_c[:, :, None, :] - z_c[:, None, :, :]
        rel_features = jnp.concatenate([_norm(z_rel), x_rel_norm], axis=-1)
        pointwise_features = jnp.concatenate([feats, _norm(v)], axis=-1)
        rel_basis = jnp.stack([z_rel, x_rel], axis=-2)  # [B, V, V, 2, 3]
        pointwise_basis = v[:, :, None, :]  # [B, V, 1, 3]

    return rel_features, pointwise_features, rel_basis, pointwise_basis


class FeatureProcessor(nn.Module):
    """Dense EGNN-like invariant feature processing
    (reference: modules/layers/feature_processor.py)."""

    out_dim: int
    mlp_hidden_dims: Sequence[int]

    @nn.compact
    def __call__(self, rel_features, pointwise_features, masked_elements):
        B, V = pointwise_features.shape[:2]
        h_i = jnp.broadcast_to(
            pointwise_features[:, :, None, :],
            (B, V, V, pointwise_features.shape[-1]),
        )
        h_j = jnp.broadcast_to(
            pointwise_features[:, None, :, :],
            (B, V, V, pointwise_features.shape[-1]),
        )
        rel = jnp.concatenate([h_i, h_j, rel_features], axis=-1)
        rel = MLP(self.mlp_hidden_dims, self.out_dim, name="relative_mlp")(rel)
        rel = rel * (~masked_elements)[:, None, :, None]

        num_atoms = (~masked_elements).sum(axis=-1)[:, None, None]
        rel_mean = rel.sum(axis=-2) / num_atoms  # [B, V, out]
        pw = MLP(self.mlp_hidden_dims, self.out_dim, name="pointwise_mlp")(
            jnp.concatenate([pointwise_features, rel_mean], axis=-1)
        )
        return rel, pw


class EquivariantCouplingLayer(CouplingLayerBase):
    """Equivariant shift + invariant isotropic scale
    (reference: modules/dense_equivariant_nvp.py:8-68)."""

    features_dim: int = 32
    mlp_hidden_dims: Sequence[int] = (128,)

    @nn.compact
    def scale_and_shift(self, z_coords, z_velocs, cond: Conditioning):
        rel_f, pw_f, rel_basis, pw_basis = equivariant_basis(
            self.transformed_vars, z_coords, z_velocs, cond
        )
        mask = cond.masked_elements
        num_atoms = (~mask).sum(axis=-1)  # [B]

        # --- shift (equivariant) ---
        rel_s, pw_s = FeatureProcessor(
            self.features_dim, tuple(self.mlp_hidden_dims), name="shift_features"
        )(rel_f, pw_f, mask)
        Kp = pw_basis.shape[-2]
        Kr = rel_basis.shape[-2]
        # In the reference Kp == Kr per basis family (num_rel_basis used for
        # both sums, dense_equivariant_coupling_layer.py:175-192); here the
        # two pointwise/relative coefficient heads match their own basis
        # counts and the final sum runs over each family.
        pw_coef = MLP(tuple(self.mlp_hidden_dims), Kp, name="shift_pointwise_mlp")(pw_s)
        rel_coef = MLP(tuple(self.mlp_hidden_dims), Kr, name="shift_relative_mlp")(rel_s)

        pointwise_shift = (pw_basis * pw_coef[..., None]).sum(-2)  # [B, V, 3]
        rel_shift = rel_basis * rel_coef[..., None]
        rel_shift = rel_shift * (~mask)[:, None, :, None, None]
        rel_shift = rel_shift.sum(axis=(-3, -2)) / num_atoms[:, None, None]  # [B, V, 3]
        shift = (pointwise_shift + rel_shift) / num_atoms[:, None, None]

        # --- scale (invariant, isotropic) ---
        rel_c, pw_c = FeatureProcessor(
            self.features_dim, tuple(self.mlp_hidden_dims), name="scale_features"
        )(rel_f, pw_f, mask)
        rel_term = MLP(tuple(self.mlp_hidden_dims), self.features_dim, name="scale_relative_mlp")(rel_c)
        rel_term = rel_term * (~mask)[:, None, :, None]
        rel_term = rel_term.sum(-2) / num_atoms[:, None, None]
        pw_term = MLP(tuple(self.mlp_hidden_dims), self.features_dim, name="scale_pointwise_mlp")(pw_c)
        log_scale = MLP(tuple(self.mlp_hidden_dims), 1, name="scale_mlp")(pw_term + rel_term)
        log_scale = jnp.repeat(log_scale, 3, axis=-1)  # isotropic [B, V, 3]

        return log_scale, shift
