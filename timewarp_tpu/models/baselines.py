"""Trivial/physical baselines (reference: modules/baselines.py:19-322).

- InitialStateGaussian: isotropic Gaussian centered at the initial state
- LearnableLinearGaussian: mean = learned per-element linear combination of
  state + velocity + force (needs forces)
- EulerMaruyamaGaussian: one learnable Langevin (Euler-Maruyama) step with
  the physical constants of the simulation preset (needs forces)
- InitialStatePointEstimate: MSE model predicting the initial state
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from timewarp_tpu.data.elements import ELEMENT_MASSES, KNOWN_ELEMENTS
from timewarp_tpu.models.flow import gaussian_log_prob, masked_sum
from timewarp_tpu.physics.constants import KB


class InitialStateGaussian(nn.Module):
    """Reference: modules/baselines.py:19-84."""

    def setup(self):
        zero = lambda _: jnp.zeros(())
        self.coords_prior_log_scale = self.param("coords_prior_log_scale", zero)
        self.velocs_prior_log_scale = self.param("velocs_prior_log_scale", zero)

    def log_likelihood(
        self, atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements
    ):
        lp_c = gaussian_log_prob(y_coords - x_coords, self.coords_prior_log_scale)
        lp_v = gaussian_log_prob(y_velocs - x_velocs, self.velocs_prior_log_scale)
        return masked_sum(lp_c, masked_elements) + masked_sum(lp_v, masked_elements)

    def __call__(self, atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements):
        ll = self.log_likelihood(
            atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements
        )
        return -(ll / (~masked_elements).sum(axis=1)).mean()

    def conditional_sample_with_logp(
        self, rng, atom_types, x_coords, x_velocs, masked_elements, num_samples
    ):
        S = num_samples
        kc, kv = jax.random.split(rng)
        sc = jnp.exp(self.coords_prior_log_scale)
        sv = jnp.exp(self.velocs_prior_log_scale)
        yc = x_coords[None] + sc * jax.random.normal(kc, (S,) + x_coords.shape)
        yv = x_velocs[None] + sv * jax.random.normal(kv, (S,) + x_velocs.shape)
        mask = jnp.tile(masked_elements, (S, 1))
        lp = masked_sum(
            gaussian_log_prob(
                (yc - x_coords[None]).reshape(-1, *x_coords.shape[1:]),
                self.coords_prior_log_scale,
            ),
            mask,
        ) + masked_sum(
            gaussian_log_prob(
                (yv - x_velocs[None]).reshape(-1, *x_velocs.shape[1:]),
                self.velocs_prior_log_scale,
            ),
            mask,
        )
        return yc, yv, lp.reshape(S, -1)


class LearnableLinearGaussian(nn.Module):
    """Reference: modules/baselines.py:87-166. Requires forces."""

    needs_forces: bool = True

    def setup(self):
        T = len(KNOWN_ELEMENTS)
        zeros = lambda _: jnp.zeros((T,))
        neg_ones = lambda _: -jnp.ones((T,))
        self.veloc_to_coord = self.param("veloc_to_coord", zeros)
        self.veloc_to_veloc = self.param("veloc_to_veloc", zeros)
        self.force_to_veloc = self.param("force_to_veloc", zeros)
        self.coord_log_std = self.param("coord_log_std", neg_ones)
        self.veloc_log_std = self.param("veloc_log_std", neg_ones)

    def _dists(self, atom_types, x_coords, x_velocs, x_forces):
        c_ls = self.coord_log_std[atom_types][..., None]  # [B, V, 1]
        v_ls = self.veloc_log_std[atom_types][..., None]
        coord_mean = x_coords + self.veloc_to_coord[atom_types][..., None] * x_velocs
        veloc_mean = (
            x_velocs
            + self.force_to_veloc[atom_types][..., None] * x_forces
            + self.veloc_to_veloc[atom_types][..., None] * x_velocs
        )
        return coord_mean, veloc_mean, c_ls, v_ls

    def log_likelihood(
        self, atom_types, x_coords, x_velocs, x_forces, y_coords, y_velocs, masked_elements
    ):
        cm, vm, c_ls, v_ls = self._dists(atom_types, x_coords, x_velocs, x_forces)
        lp_c = gaussian_log_prob(y_coords - cm, c_ls)
        lp_v = gaussian_log_prob(y_velocs - vm, v_ls)
        return masked_sum(lp_c, masked_elements) + masked_sum(lp_v, masked_elements)

    def __call__(
        self, atom_types, x_coords, x_velocs, x_forces, y_coords, y_velocs, masked_elements
    ):
        ll = self.log_likelihood(
            atom_types, x_coords, x_velocs, x_forces, y_coords, y_velocs, masked_elements
        )
        return -(ll / (~masked_elements).sum(axis=1)).mean()


class EulerMaruyamaGaussian(nn.Module):
    """Reference: modules/baselines.py:169-296. One learnable Langevin step
    with T=310K, gamma=0.3/ps, dt = step_width * 0.5 fs."""

    step_width_init: int = 1
    needs_forces: bool = True
    temperature: float = 310.0
    gamma: float = 0.3

    def setup(self):
        T = len(KNOWN_ELEMENTS)
        masses = jnp.asarray([ELEMENT_MASSES[e] for e in KNOWN_ELEMENTS])
        self.delta_t = self.step_width_init * 0.5e-3  # ps
        self.delta_t_factor = self.param("delta_t_factor", lambda _: jnp.zeros((1,)))
        self.atom_mass = self.param("atom_mass_log", lambda _: jnp.log(masses))
        self.coord_log_std = self.param("coord_log_std", lambda _: -jnp.ones((T,)))
        self.veloc_log_std = self.param("veloc_log_std", lambda _: -jnp.ones((T,)))

    def _dists(self, atom_types, x_coords, x_velocs, x_forces):
        dt = self.delta_t * jnp.exp(self.delta_t_factor)
        masses = jnp.exp(self.atom_mass)[atom_types][..., None]  # [B, V, 1]
        coord_mean = x_coords + dt * x_velocs
        veloc_mean = x_velocs + dt * x_forces / masses - self.gamma * dt * x_velocs
        veloc_std = jnp.sqrt(2.0 * self.gamma * KB * self.temperature * dt / masses)
        veloc_std = veloc_std + jnp.exp(self.veloc_log_std)[atom_types][..., None]
        c_ls = self.coord_log_std[atom_types][..., None]
        return coord_mean, veloc_mean, c_ls, jnp.log(veloc_std)

    def log_likelihood(
        self, atom_types, x_coords, x_velocs, x_forces, y_coords, y_velocs, masked_elements
    ):
        cm, vm, c_ls, v_ls = self._dists(atom_types, x_coords, x_velocs, x_forces)
        lp_c = gaussian_log_prob(y_coords - cm, c_ls)
        lp_v = gaussian_log_prob(y_velocs - vm, v_ls)
        return masked_sum(lp_c, masked_elements) + masked_sum(lp_v, masked_elements)

    def __call__(
        self, atom_types, x_coords, x_velocs, x_forces, y_coords, y_velocs, masked_elements
    ):
        ll = self.log_likelihood(
            atom_types, x_coords, x_velocs, x_forces, y_coords, y_velocs, masked_elements
        )
        return -(ll / (~masked_elements).sum(axis=1)).mean()

    def conditional_sample(
        self, rng, atom_types, x_coords, x_velocs, x_forces, masked_elements, num_samples
    ):
        cm, vm, c_ls, v_ls = self._dists(atom_types, x_coords, x_velocs, x_forces)
        S = num_samples
        kc, kv = jax.random.split(rng)
        yc = cm[None] + jnp.exp(c_ls)[None] * jax.random.normal(kc, (S,) + cm.shape)
        yv = vm[None] + jnp.exp(v_ls)[None] * jax.random.normal(kv, (S,) + vm.shape)
        return yc, yv


class InitialStatePointEstimate(nn.Module):
    """MSE point estimate of the initial state (reference:
    modules/baselines.py:299-322, wrapped by PointEstimateWrapper at
    modules/model_wrappers/point_estimate.py:42-78)."""

    def setup(self):
        self.dummy = self.param("dummy", lambda _: jnp.zeros((1,)))

    def predict(self, atom_types, x_coords, x_velocs, masked_elements):
        return x_coords + 0.0 * self.dummy, x_velocs

    def __call__(self, atom_types, x_coords, x_velocs, y_coords, y_velocs, masked_elements):
        """Mean per-atom MSE over coords+velocs."""
        pc, pv = self.predict(atom_types, x_coords, x_velocs, masked_elements)
        se = masked_sum((pc - y_coords) ** 2, masked_elements) + masked_sum(
            (pv - y_velocs) ** 2, masked_elements
        )
        return (se / (~masked_elements).sum(axis=1)).mean()
