"""Conditional VAE density model (Sohn et al. 2015).

Reference: modules/model_wrappers/conditional_vae.py:17-273. Prior p(z|x),
generator p(y|x,z), recognizer q(z|x,y) are all transformer mean/log-scale
nets over per-atom features; the surrogate log-likelihood is the ELBO or
IWAE bound with S latent samples. Targets are displacement residuals for
coords, raw velocities; conditioning coords are COM-centered.
"""
import dataclasses
import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from timewarp_tpu.data.elements import KNOWN_ELEMENTS
from timewarp_tpu.models.flow import centre_of_mass, gaussian_log_prob, masked_sum
from timewarp_tpu.models.layers.transformer import TransformerBlock, TransformerConfig


@dataclasses.dataclass
class TransformerCVAEConfig:
    """Reference: model_configs.py:27-36."""

    atom_embedding_dim: int = 32
    transformer_hidden_dim: int = 128
    latent_mlp_hidden_dims: Tuple[int, ...] = (256,)
    num_transformer_layers: int = 3
    latent_cvae_dim: int = 8
    num_elbo_samples: int = 1
    elbo_estimator: str = "elbo"  # elbo | iwae
    transformer_config: TransformerConfig = dataclasses.field(
        default_factory=TransformerConfig
    )


class MeanLogScaleNet(nn.Module):
    """Transformer emitting (mean, log_scale) pairs per atom
    (reference: modules/transformer_gaussian_density.py:12-51)."""

    output_dim: int
    latent_dim: int
    mlp_hidden_dims: Tuple[int, ...]
    num_layers: int
    config: TransformerConfig

    @nn.compact
    def __call__(self, feats, masked_elements):
        out = TransformerBlock(
            output_dim=2 * self.output_dim,
            latent_dim=self.latent_dim,
            mlp_hidden_dims=self.mlp_hidden_dims,
            num_layers=self.num_layers,
            config=self.config,
        )(feats, masked_elements)
        return jnp.split(out, 2, axis=-1)


class ConditionalVAEModel(nn.Module):
    config: TransformerCVAEConfig
    needs_latent_rng: bool = True

    def setup(self):
        cfg = self.config
        self.atom_embedder = nn.Embed(len(KNOWN_ELEMENTS), cfg.atom_embedding_dim)

        def net(out_dim):
            return MeanLogScaleNet(
                output_dim=out_dim,
                latent_dim=cfg.transformer_hidden_dim,
                mlp_hidden_dims=tuple(cfg.latent_mlp_hidden_dims),
                num_layers=cfg.num_transformer_layers,
                config=cfg.transformer_config,
            )

        self.prior = net(cfg.latent_cvae_dim)
        self.generator = net(6)
        self.recognizer = net(cfg.latent_cvae_dim)

    def _features(self, atom_types, x_coords, x_velocs, masked_elements):
        com = centre_of_mass(x_coords, masked_elements)
        return jnp.concatenate(
            [self.atom_embedder(atom_types), x_coords - com, x_velocs], axis=-1
        )

    def log_likelihood(
        self,
        atom_types,
        x_coords,
        x_velocs,
        y_coords,
        y_velocs,
        masked_elements,
        rng=None,
    ) -> jnp.ndarray:
        """ELBO/IWAE surrogate of log p(y|x). The latent sampling rng comes
        from the 'latent' RNG collection when not passed explicitly."""
        if rng is None:
            rng = self.make_rng("latent")
        cfg = self.config
        S = cfg.num_elbo_samples
        y_c_res = y_coords - x_coords
        y_v_res = y_velocs

        x_feats = self._features(atom_types, x_coords, x_velocs, masked_elements)
        xy_feats = jnp.concatenate([x_feats, y_c_res, y_v_res], axis=-1)

        # q(z|x, y)
        zq_mean, zq_log_scale = self.recognizer(xy_feats, masked_elements)
        eps = jax.random.normal(rng, (S,) + zq_mean.shape, zq_mean.dtype)
        z = zq_mean[None] + jnp.exp(zq_log_scale)[None] * eps  # [S, B, V, Z]

        mask_b = masked_elements[None].repeat(S, 0).reshape(-1, masked_elements.shape[-1])
        z_flat = z.reshape(-1, *z.shape[2:])  # [S*B, V, Z]
        lq = masked_sum(
            gaussian_log_prob(z_flat - jnp.tile(zq_mean, (S, 1, 1)), jnp.tile(zq_log_scale, (S, 1, 1))),
            mask_b,
        )  # [S*B]

        # p(z|x)
        zp_mean, zp_log_scale = self.prior(x_feats, masked_elements)
        lp = masked_sum(
            gaussian_log_prob(z_flat - jnp.tile(zp_mean, (S, 1, 1)), jnp.tile(zp_log_scale, (S, 1, 1))),
            mask_b,
        )

        # p(y|x, z)
        xz_feats = jnp.concatenate([jnp.tile(x_feats, (S, 1, 1)), z_flat], axis=-1)
        y_mean, y_log_scale = self.generator(xz_feats, mask_b)
        y_target = jnp.tile(jnp.concatenate([y_c_res, y_v_res], axis=-1), (S, 1, 1))
        lgen = masked_sum(gaussian_log_prob(y_target - y_mean, y_log_scale), mask_b)

        log_weights = (lgen - lq + lp).reshape(S, -1)  # [S, B]
        if cfg.elbo_estimator == "elbo":
            return log_weights.mean(axis=0)
        return jax.scipy.special.logsumexp(log_weights, axis=0) - math.log(S)

    def __call__(self, atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements):
        ll = self.log_likelihood(
            atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements
        )
        return -(ll / (~masked_elements).sum(axis=1)).mean()

    def conditional_sample(
        self, rng, atom_types, x_coords, x_velocs, masked_elements, num_samples
    ):
        S = num_samples
        x_feats = self._features(atom_types, x_coords, x_velocs, masked_elements)
        zp_mean, zp_log_scale = self.prior(x_feats, masked_elements)
        kz, ky = jax.random.split(rng)
        z = zp_mean[None] + jnp.exp(zp_log_scale)[None] * jax.random.normal(
            kz, (S,) + zp_mean.shape, zp_mean.dtype
        )
        z_flat = z.reshape(-1, *z.shape[2:])
        mask_b = jnp.tile(masked_elements, (S, 1))
        xz = jnp.concatenate([jnp.tile(x_feats, (S, 1, 1)), z_flat], axis=-1)
        y_mean, y_log_scale = self.generator(xz, mask_b)
        y = y_mean + jnp.exp(y_log_scale) * jax.random.normal(ky, y_mean.shape, y_mean.dtype)
        y_c_res, y_v_res = jnp.split(y, 2, axis=-1)
        B, V = atom_types.shape
        yc = (jnp.tile(x_coords, (S, 1, 1)) + y_c_res).reshape(S, B, V, 3)
        yv = y_v_res.reshape(S, B, V, 3)
        return yc, yv
