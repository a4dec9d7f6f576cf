"""Diagonal-Gaussian conditional density baseline.

Reference: modules/model_wrappers/gaussian_density.py:40-136 +
modules/transformer_gaussian_density.py:74-125. A transformer predicts
per-atom means and log-stds of the (coords, velocs) residuals; target
residuals are y_coords - x_coords and y_velocs - x_velocs, conditioning
coords are COM-centered. Unlike the reference (conditional_sample raises
NotImplementedError) sampling is implemented.
"""
import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from timewarp_tpu.data.elements import KNOWN_ELEMENTS
from timewarp_tpu.models.flow import centre_of_mass, gaussian_log_prob, masked_sum
from timewarp_tpu.models.layers.transformer import TransformerBlock, TransformerConfig


@dataclasses.dataclass
class GaussianDensityTransformerConfig:
    """Reference: model_configs.py:72-78."""

    atom_embedding_dim: int = 32
    latent_dim: int = 128
    latent_mlp_hidden_dims: Tuple[int, ...] = (256,)
    num_transformer_layers: int = 3
    transformer_config: TransformerConfig = dataclasses.field(
        default_factory=TransformerConfig
    )


class GaussianDensityModel(nn.Module):
    config: GaussianDensityTransformerConfig

    def setup(self):
        cfg = self.config
        self.atom_embedder = nn.Embed(len(KNOWN_ELEMENTS), cfg.atom_embedding_dim)
        self.net = TransformerBlock(
            output_dim=12,  # coord mean/log-std + veloc mean/log-std, 3 each
            latent_dim=cfg.latent_dim,
            mlp_hidden_dims=tuple(cfg.latent_mlp_hidden_dims),
            num_layers=cfg.num_transformer_layers,
            config=cfg.transformer_config,
        )

    def _mean_log_std(self, atom_types, x_coords, x_velocs, masked_elements):
        com = centre_of_mass(x_coords, masked_elements)
        feats = jnp.concatenate(
            [self.atom_embedder(atom_types), x_coords - com, x_velocs], axis=-1
        )
        out = self.net(feats, masked_elements)
        return jnp.split(out, 4, axis=-1)  # cm, vm, cls, vls each [B, V, 3]

    def log_likelihood(
        self, atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements
    ) -> jnp.ndarray:
        cm, vm, c_log_std, v_log_std = self._mean_log_std(
            atom_types, x_coords, x_velocs, masked_elements
        )
        lp_c = gaussian_log_prob(y_coords - x_coords - cm, c_log_std)
        lp_v = gaussian_log_prob(y_velocs - x_velocs - vm, v_log_std)
        return masked_sum(lp_c, masked_elements) + masked_sum(lp_v, masked_elements)

    def __call__(self, atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements):
        ll = self.log_likelihood(
            atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements
        )
        num_atoms = (~masked_elements).sum(axis=1)
        return -(ll / num_atoms).mean()

    def conditional_sample_with_logp(
        self, rng, atom_types, x_coords, x_velocs, masked_elements, num_samples: int
    ):
        cm, vm, c_log_std, v_log_std = self._mean_log_std(
            atom_types, x_coords, x_velocs, masked_elements
        )
        S = num_samples
        kc, kv = jax.random.split(rng)
        eps_c = jax.random.normal(kc, (S,) + cm.shape, cm.dtype)
        eps_v = jax.random.normal(kv, (S,) + vm.shape, vm.dtype)
        yc = x_coords[None] + cm[None] + jnp.exp(c_log_std)[None] * eps_c
        yv = x_velocs[None] + vm[None] + jnp.exp(v_log_std)[None] * eps_v
        lp = masked_sum(
            gaussian_log_prob(yc - x_coords[None] - cm[None], c_log_std[None]).reshape(
                -1, *cm.shape[1:]
            ),
            jnp.tile(masked_elements, (S, 1)),
        ) + masked_sum(
            gaussian_log_prob(yv - x_velocs[None] - vm[None], v_log_std[None]).reshape(
                -1, *vm.shape[1:]
            ),
            jnp.tile(masked_elements, (S, 1)),
        )
        return yc, yv, lp.reshape(S, -1)

    def conditional_sample(self, rng, atom_types, x_coords, x_velocs, masked_elements, num_samples):
        yc, yv, _ = self.conditional_sample_with_logp(
            rng, atom_types, x_coords, x_velocs, masked_elements, num_samples
        )
        return yc, yv
