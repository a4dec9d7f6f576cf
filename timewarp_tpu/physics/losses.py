"""Energy-based training losses (fully differentiable on-device).

Counterparts of the reference's AcceptanceLoss / EnergyLoss
(reference: losses.py:359-664), which had to evaluate OpenMM energies via a
host round-trip and custom autograd bridge (utils/openmm/openmm_bridge.py).
Here the AMBER potential is JAX, so d(loss)/d(params) flows through the
energy function analytically -- the whole objective is one XLA program.

The reference evaluates energies per-molecule via batch ``segments``
(reference: losses.py:58-98, dataloader.py:194-196 -- a host loop over
contiguous same-protein runs). The TPU-native equivalent is shape-static:
mixed-molecule batches carry a *stacked padded* AmberSystem (one set of
parameters per batch row, physics/provider.py) threaded through the train
step as a regular traced input, and one ``vmap`` evaluates every row's
energy under its own parameters -- no segment loop, no per-protein
recompilation.
"""
import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.physics.energy import potential_energy


@dataclasses.dataclass
class EnergyModel:
    """Bound energy evaluator for one molecular system."""

    system: object
    temperature: float = 310.0

    def potential(self, coords: jnp.ndarray) -> jnp.ndarray:
        """[B, V, 3] (padded; only the first num_atoms rows are real) ->
        [B] potential in kT. Padded atoms must be stripped by the caller
        passing coords already sliced to the system's atom count."""
        kT = kbT(self.temperature)
        return jax.vmap(lambda c: potential_energy(self.system, c))(coords) / kT

    @property
    def masses(self):
        return self.system.masses

    @property
    def kT(self) -> float:
        return kbT(self.temperature)


@dataclasses.dataclass
class MixedEnergyModel:
    """Marker/config for mixed-molecule batches: the per-row parameters
    arrive as a stacked padded AmberSystem via the loss's ``energy_system``
    argument (built by physics/provider.EnergyProvider.stacked_for and fed
    through the train step alongside the batch)."""

    temperature: float = 310.0

    @property
    def kT(self) -> float:
        return kbT(self.temperature)


def _masked_kinetic(velocs, masses, kT, random_velocs):
    """[B, V, 3] -> [B] with zero-mass (dummy/padded) atoms excluded; masses
    may be [V] (shared system) or [B, V] (stacked)."""
    if random_velocs:
        real = (masses > 0.0).astype(velocs.dtype)
        if masses.ndim == 1:
            real = real[None]
        return 0.5 * (real[..., None] * velocs**2).sum((-1, -2))
    return 0.5 * (masses * (velocs**2).sum(-1)).sum(-1) / kT


def _sample_and_energies(
    model, params, batch, rng, energy_model, random_velocs, e_pot_fn, masses
):
    if random_velocs:
        k_v, rng = jax.random.split(rng)
        x_velocs = jax.random.normal(k_v, batch.atom_velocs.shape)
    else:
        x_velocs = batch.atom_velocs

    yc, yv, logp_xy = model.apply(
        params, rng, batch.atom_types, batch.atom_coords, x_velocs,
        batch.masked_elements, 1, method="conditional_sample_with_logp",
    )
    yc, yv, logp_xy = yc[0], yv[0], logp_xy[0]

    e_pot_y = e_pot_fn(yc)
    e_kin_y = _masked_kinetic(yv, masses, energy_model.kT, random_velocs)
    return x_velocs, yc, yv, logp_xy, e_pot_y, e_kin_y


def make_energy_loss(config, energy_model) -> Callable:
    """Build acceptance/energy losses. config: losses.LossConfig.

    ``energy_model`` is an EnergyModel (single shared system; the
    ``energy_system`` loss argument stays None) or a MixedEnergyModel
    (per-row stacked system passed as ``energy_system``)."""
    assert energy_model is not None, "energy losses need an EnergyModel"
    name = config.name
    random_velocs = config.random_velocs
    mixed = isinstance(energy_model, MixedEnergyModel)

    def _binding(batch, energy_system):
        """(e_pot_fn [B,V,3]->[B] in kT, masses) for this batch."""
        if mixed:
            assert energy_system is not None, (
                "MixedEnergyModel losses need the stacked energy_system"
            )
            from timewarp_tpu.physics.provider import batched_mixed_potential

            def e_pot(c):
                return batched_mixed_potential(energy_system, c) / energy_model.kT

            return e_pot, energy_system.masses
        V_sys = energy_model.system.num_atoms

        def e_pot(c):
            return energy_model.potential(c[:, :V_sys])

        # Zero-pad masses to the (possibly wider) bucketed batch width so
        # kinetic energies see exactly the real atoms: padding rows have
        # mass 0 and are excluded by _masked_kinetic (regression: a batch
        # padded 22 -> 24 crashed the kinetic broadcast).
        v_batch = batch.atom_coords.shape[1]
        masses = jnp.pad(jnp.asarray(energy_model.masses), (0, v_batch - V_sys))
        return e_pot, masses

    def acceptance_loss(
        model, params, batch, rng, step=0, energy_system=None
    ) -> Tuple[jnp.ndarray, Dict]:
        """-log MH acceptance (optionally clamped) + beta * conditional
        entropy bonus (reference: losses.py:359-556)."""
        e_pot_fn, masses = _binding(batch, energy_system)
        x_velocs, yc, yv, logp_xy, e_pot_y, e_kin_y = _sample_and_energies(
            model, params, batch, rng, energy_model, random_velocs, e_pot_fn, masses
        )
        kT = energy_model.kT
        e_pot_x = e_pot_fn(batch.atom_coords)
        e_kin_x = _masked_kinetic(x_velocs, masses, kT, random_velocs)

        flip = 1.0 if random_velocs else -1.0
        logp_yx = model.apply(
            params, batch.atom_types, yc, flip * yv, batch.atom_coords,
            flip * x_velocs, batch.masked_elements, method="log_likelihood",
        )

        energy_delta = (e_pot_y - e_pot_x) + (e_kin_y - e_kin_x)
        neg_log_acceptance = energy_delta + logp_xy - logp_yx
        if config.clamp:
            core = jnp.maximum(neg_log_acceptance, 0.0)
        else:
            core = neg_log_acceptance
        total = core + config.beta * logp_xy

        if config.high_energy_threshold > 0:
            good = energy_delta < config.high_energy_threshold
            weight = good / jnp.maximum(good.sum(), 1)
        else:
            weight = jnp.ones_like(total) / total.shape[0]

        num_atoms = (~batch.masked_elements).sum(axis=1)
        loss = (weight * total / num_atoms).sum()
        metrics = {
            "acceptance_loss": loss,
            "energy_delta": energy_delta.mean(),
            "logp_xy": logp_xy.mean(),
            "logp_yx": logp_yx.mean(),
            "mh_acceptance_estimate": jnp.minimum(
                1.0, jnp.exp(-neg_log_acceptance)
            ).mean(),
        }
        return loss, metrics

    def energy_loss(model, params, batch, rng, step=0, energy_system=None):
        """E[U(y)] + logp_xy on model samples (reference: losses.py:559-664)."""
        e_pot_fn, masses = _binding(batch, energy_system)
        _, yc, yv, logp_xy, e_pot_y, e_kin_y = _sample_and_energies(
            model, params, batch, rng, energy_model, random_velocs, e_pot_fn, masses
        )
        energy = e_pot_y + e_kin_y
        num_atoms = (~batch.masked_elements).sum(axis=1)
        loss = ((energy + logp_xy) / num_atoms).mean()
        return loss, {
            "energy_loss": loss,
            "sample_energy": energy.mean(),
            "logp_xy": logp_xy.mean(),
        }

    def bonded_excess_loss(model, params, batch, rng, step=0, energy_system=None):
        """Mean relu(excess bond+angle energy of one proposal sample over
        the current state) PLUS relu(excess kinetic energy over its 3V/2
        equipartition mean), kT per atom.

        Targets the proposal-heat failure mode directly (round-2 diagnosis:
        flow samples sit slightly off the bond/angle manifold and the MH
        exponent punishes that by tens of kT). Unlike the full energy loss
        it has no pull toward low-energy minima: proposals matching the
        data's thermal bonded energy pay zero.

        The kinetic term is NOT optional: a bonded-only version of this
        loss lowered coordinate energy by twisting the velocity-coupled
        layers instead, inflating sampled velocity std to 1.47 (kinetic
        +38 kT median) and collapsing MH acceptance to zero (round-3 run B
        postmortem). The MH exponent pays for kinetic excess exactly like
        potential excess, so the regularizer must too."""
        assert not mixed, "bonded excess loss: single-system batches only"
        from timewarp_tpu.physics.energy import angle_energy, bond_energy

        system = energy_model.system
        V_sys = system.num_atoms
        kT = energy_model.kT

        def bonded(c):  # [B, V, 3] -> [B] in kT
            return jax.vmap(
                lambda x: bond_energy(system, x) + angle_energy(system, x)
            )(c[:, :V_sys]) / kT

        if random_velocs:
            k_v, rng = jax.random.split(rng)
            x_velocs = jax.random.normal(k_v, batch.atom_velocs.shape)
        else:
            x_velocs = batch.atom_velocs
        yc, yv, _ = model.apply(
            params, rng, batch.atom_types, batch.atom_coords, x_velocs,
            batch.masked_elements, 1, method="conditional_sample_with_logp",
        )
        excess_pot = jax.nn.relu(bonded(yc[0]) - bonded(batch.atom_coords))
        num_atoms = (~batch.masked_elements).sum(axis=1)
        masses = jnp.pad(
            jnp.asarray(energy_model.masses),
            (0, batch.atom_coords.shape[1] - V_sys),
        )
        e_kin = _masked_kinetic(yv[0], masses, kT, random_velocs)
        excess_kin = jax.nn.relu(e_kin - 1.5 * num_atoms)
        excess = excess_pot + excess_kin
        loss = (excess / num_atoms).mean()
        return loss, {
            "bonded_excess_loss": loss,
            "bonded_excess_kT": excess_pot.mean(),
            "kinetic_excess_kT": excess_kin.mean(),
        }

    if name == "acceptance":
        return acceptance_loss
    if name == "energy":
        return energy_loss
    if name == "bonded":
        return bonded_excess_loss

    # Convex combinations with NLL (reference: ConvexCombinationLoss,
    # losses.py:731-788; NLLAndAcceptanceLossConfig loss_configs.py). Fixed
    # weights, or softmax(pre_softmax_weights) annealed by the geometric
    # schedule as a pure function of the step counter.
    from timewarp_tpu.losses import convex_combination, nll_loss

    other = {
        "nll_acceptance": acceptance_loss,
        "nll_energy": energy_loss,
        "nll_bonded": bonded_excess_loss,
    }[name]

    def nll_fn(model, params, batch, rng, step=0, energy_system=None):
        return nll_loss(model, params, batch, rng, random_velocs)

    if config.pre_softmax_weights is not None:
        return convex_combination(
            [nll_fn, other],
            pre_softmax_weights=config.pre_softmax_weights,
            schedule=config.schedule,
        )
    return convex_combination([nll_fn, other], weights=config.weights or (0.5, 0.5))
