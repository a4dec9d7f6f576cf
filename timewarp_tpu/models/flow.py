"""Conditional RealNVP flow density model p(y|x).

Semantics mirror the reference's ``ConditionalFlowDensityModel``
(reference: modules/model_wrappers/flow.py:106-336):

- conditioning coords are COM-centered (masked uniform mean,
  reference: utils/molecule_utils.py:15-27)
- the internal target is the displacement y - x (``use_displacement_as_target``)
- latent prior is an isotropic Gaussian with learnable per-group log scales
- log p(y|x) = log p(z) + sum of coupling log-dets
- sampling runs the coupling chain in reverse layer order

TPU-first structure: one ``Conditioning`` context (atom embeddings, centered
coords, pairwise distances) is computed per call and shared by every
coupling layer; samples are drawn by folding the S proposals into the batch
axis (static shapes, single compiled program).
"""
import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from timewarp_tpu.data.elements import KNOWN_ELEMENTS
from timewarp_tpu.models.layers.kernel_attention import pairwise_distances
from timewarp_tpu.models.nvp import Conditioning


def centre_of_mass(coords: jnp.ndarray, masked_elements: jnp.ndarray) -> jnp.ndarray:
    """Masked uniform mean over atoms: [B, V, 3] -> [B, 1, 3]."""
    inv = ~masked_elements
    total = (coords * inv[:, :, None]).sum(axis=1, keepdims=True)
    count = inv.sum(axis=1)[:, None, None]
    return total / count


def gaussian_log_prob(x: jnp.ndarray, log_scale: jnp.ndarray) -> jnp.ndarray:
    """Elementwise N(0, exp(log_scale)^2) log density."""
    var_term = 2.0 * log_scale
    return -0.5 * (x * x) * jnp.exp(-var_term) - log_scale - 0.5 * math.log(2 * math.pi)


def masked_sum(x: jnp.ndarray, masked_elements: jnp.ndarray) -> jnp.ndarray:
    """[B, V, 3] -> [B], zeroing padded atoms."""
    return jnp.where(masked_elements[:, :, None], 0.0, x).sum(axis=(-1, -2))


class ConditionalFlowDensity(nn.Module):
    """The flagship conditional density model.

    ``layer_factory(transformed_vars, name)`` builds one coupling layer; the
    chain is ``num_coupling_layers`` alternating positions/velocities layers
    realised as a ``nn.scan`` over identical pairs (one traced pair body --
    see models/nvp.py CouplingPair).
    """

    layer_factory: "callable"
    num_coupling_layers: int = 8
    position_layer_index_mod_2: int = 0
    atom_embedding_dim: int = 32
    use_displacement_as_target: bool = True
    scale_learnable: bool = True
    ignore_conditional_velocity: bool = False

    def setup(self):
        from timewarp_tpu.models.nvp import PairChain

        assert self.num_coupling_layers % 2 == 0
        self.atom_embedder = nn.Embed(len(KNOWN_ELEMENTS), self.atom_embedding_dim)
        self.chain = PairChain(
            layer_factory=self.layer_factory,
            num_pairs=self.num_coupling_layers // 2,
            first_transformed=(
                "positions" if self.position_layer_index_mod_2 == 0 else "velocities"
            ),
        )
        zero = lambda _: jnp.zeros(())
        if self.scale_learnable:
            self.coords_prior_log_scale = self.param("coords_prior_log_scale", zero)
            self.velocs_prior_log_scale = self.param("velocs_prior_log_scale", zero)
        else:
            self.coords_prior_log_scale = jnp.zeros(())
            self.velocs_prior_log_scale = jnp.zeros(())

    def _conditioning(self, atom_types, x_coords, x_velocs, masked_elements):
        if self.ignore_conditional_velocity:
            x_velocs = jnp.zeros_like(x_velocs)
        com = centre_of_mass(x_coords, masked_elements)
        x_centered = x_coords - com
        feats = self.atom_embedder(atom_types)
        dists = pairwise_distances(x_centered)
        return (
            Conditioning(
                x_features=feats,
                x_coords=x_centered,
                x_velocs=x_velocs,
                masked_elements=masked_elements,
                dists=dists,
            ),
            com,
        )

    def _run_chain(self, z_coords, z_velocs, cond, reverse: bool):
        """Apply the coupling chain; returns (z_coords, z_velocs, logdet_sum).

        Density mode (reverse=False) applies layers in order y -> z; sampling
        mode applies them (and the stacked scan parameters) in reverse order
        z -> y (reference: flow.py:83-85).
        """
        return self.chain(z_coords, z_velocs, cond, reverse=reverse)

    def _prior_log_prob(
        self, z_coords, z_velocs, masked_elements, log_temp_c=0.0, log_temp_v=0.0
    ):
        """log_temp_*: log of a proposal temperature multiplying the prior
        scale. Tempering defines a *different, exactly tractable* proposal
        density q_tau -- MH with q_tau's own density in both directions stays
        exact, so tau is a pure inference-time knob (no reference analogue;
        used to trade proposal heat against reverse likelihood)."""
        lp_c = masked_sum(
            gaussian_log_prob(z_coords, self.coords_prior_log_scale + log_temp_c),
            masked_elements,
        )
        lp_v = masked_sum(
            gaussian_log_prob(z_velocs, self.velocs_prior_log_scale + log_temp_v),
            masked_elements,
        )
        return lp_c + lp_v

    def log_likelihood(
        self,
        atom_types: jnp.ndarray,  # [B, V] int
        x_coords: jnp.ndarray,  # [B, V, 3]
        x_velocs: jnp.ndarray,
        y_coords: jnp.ndarray,
        y_velocs: jnp.ndarray,
        masked_elements: jnp.ndarray,  # [B, V] bool
        temperature: float = 1.0,
        veloc_temperature: float = None,
    ) -> jnp.ndarray:  # [B]
        cond, _ = self._conditioning(atom_types, x_coords, x_velocs, masked_elements)
        z_coords = y_coords - x_coords if self.use_displacement_as_target else y_coords
        z_velocs = y_velocs
        z_coords, z_velocs, logdet = self._run_chain(
            z_coords, z_velocs, cond, reverse=False
        )
        tv = temperature if veloc_temperature is None else veloc_temperature
        return (
            self._prior_log_prob(
                z_coords,
                z_velocs,
                masked_elements,
                log_temp_c=math.log(temperature),
                log_temp_v=math.log(tv),
            )
            + logdet
        )

    def __call__(self, atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements):
        """Mean per-atom NLL over the batch (the training loss surface,
        reference: modules/model_wrappers/density_model_base.py:14-47)."""
        ll = self.log_likelihood(
            atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements
        )
        num_atoms = (~masked_elements).sum(axis=1)
        return -(ll / num_atoms).mean()

    def conditional_sample_with_logp(
        self,
        rng: jax.Array,
        atom_types: jnp.ndarray,  # [B, V]
        x_coords: jnp.ndarray,  # [B, V, 3]
        x_velocs: jnp.ndarray,
        masked_elements: jnp.ndarray,
        num_samples: int,
        temperature: float = 1.0,
        veloc_temperature: float = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Draw S proposals per batch element.

        ``temperature`` scales the latent prior the proposals are drawn from
        (tau < 1 = colder, sharper proposals); the returned logp is the exact
        density of the TEMPERED proposal, so MH with it stays exact.

        Returns (y_coords [S,B,V,3], y_velocs [S,B,V,3], logp [S,B]).
        """
        B, V = atom_types.shape
        S = num_samples
        tv = temperature if veloc_temperature is None else veloc_temperature
        cond, com = self._conditioning(atom_types, x_coords, x_velocs, masked_elements)

        kc, kv = jax.random.split(rng)
        sc = temperature * jnp.exp(self.coords_prior_log_scale)
        sv = tv * jnp.exp(self.velocs_prior_log_scale)
        z_coords = sc * jax.random.normal(kc, (S * B, V, 3), x_coords.dtype)
        z_velocs = sv * jax.random.normal(kv, (S * B, V, 3), x_coords.dtype)

        prior_lp = self._prior_log_prob(
            z_coords,
            z_velocs,
            jnp.tile(masked_elements, (S, 1)),
            log_temp_c=math.log(temperature),
            log_temp_v=math.log(tv),
        )  # [S*B]

        cond_tiled = Conditioning(
            x_features=jnp.tile(cond.x_features, (S, 1, 1)),
            x_coords=jnp.tile(cond.x_coords, (S, 1, 1)),
            x_velocs=jnp.tile(cond.x_velocs, (S, 1, 1)),
            masked_elements=jnp.tile(cond.masked_elements, (S, 1)),
            dists=jnp.tile(cond.dists, (S, 1, 1)),
        )
        y_c_res, y_v_res, logdet = self._run_chain(
            z_coords, z_velocs, cond_tiled, reverse=True
        )

        x_rep = jnp.tile(x_coords, (S, 1, 1))
        y_coords = x_rep + y_c_res if self.use_displacement_as_target else y_c_res
        y_velocs = y_v_res

        logp = (prior_lp + logdet).reshape(S, B)
        return (
            y_coords.reshape(S, B, V, 3),
            y_velocs.reshape(S, B, V, 3),
            logp,
        )

    def conditional_sample(self, rng, atom_types, x_coords, x_velocs, masked_elements, num_samples):
        y_coords, y_velocs, _ = self.conditional_sample_with_logp(
            rng, atom_types, x_coords, x_velocs, masked_elements, num_samples
        )
        return y_coords, y_velocs
