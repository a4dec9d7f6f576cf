"""Multi-molecule energy provider.

The reference keeps a FIFO cache of per-protein OpenMM energy modules and
evaluates batches per contiguous same-protein segment
(reference: utils/openmm/openmm_provider.py:20-152, losses.py:58-98).

TPU-native design: AmberSystems are *padded to a common atom count* with
inert dummy atoms (zero charge/epsilon/screen/mass, zeroed nonbonded scale
rows) and stacked leaf-wise, so one ``vmap`` evaluates a mixed-molecule
batch with per-element parameters -- no host-side segment loop, no shape
recompilation per protein set (bucketed by padded size).

Dummy-atom safety: all pair terms vanish through zero charges/epsilons/
scales; HCT descreening by dummies is masked by zero screen; the ACE SA
term is masked by ``masses > 0``.
"""
import dataclasses
import os
from collections import OrderedDict
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.physics.energy import potential_energy
from timewarp_tpu.physics.system import AmberSystem


def pad_system(system: AmberSystem, v_max: int, max_terms: Optional[dict] = None) -> AmberSystem:
    """Pad a system with inert dummy atoms to v_max atoms (and bonded-term
    tables to common sizes for stacking)."""
    V = system.num_atoms
    assert v_max >= V
    pad = v_max - V

    def pad1(x, value=0.0):
        return jnp.pad(x, (0, pad), constant_values=value)

    def pad_terms(idx, *params, n_target):
        n = idx.shape[0]
        extra = n_target - n
        assert extra >= 0
        idx = jnp.pad(idx, ((0, extra), (0, 0)), constant_values=0)
        out = [jnp.pad(p, (0, extra), constant_values=0.0) for p in params]
        return idx, out

    mt = max_terms or {}
    bond_idx, (bond_k, bond_r0) = pad_terms(
        system.bond_idx, system.bond_k, system.bond_r0,
        n_target=mt.get("bonds", system.bond_idx.shape[0]),
    )
    angle_idx, (angle_k, angle_t0) = pad_terms(
        system.angle_idx, system.angle_k, system.angle_theta0,
        n_target=mt.get("angles", system.angle_idx.shape[0]),
    )
    torsion_idx, (t_k, t_n, t_phase) = pad_terms(
        system.torsion_idx, system.torsion_k, system.torsion_n, system.torsion_phase,
        n_target=mt.get("torsions", system.torsion_idx.shape[0]),
    )

    scale_coul = jnp.zeros((v_max, v_max), system.scale_coul.dtype)
    scale_coul = scale_coul.at[:V, :V].set(system.scale_coul)
    scale_lj = jnp.zeros((v_max, v_max), system.scale_lj.dtype)
    scale_lj = scale_lj.at[:V, :V].set(system.scale_lj)

    has_gb = system.gb_radii.size > 0
    return dataclasses.replace(
        system,
        masses=pad1(system.masses),
        charges=pad1(system.charges),
        bond_idx=bond_idx, bond_k=bond_k, bond_r0=bond_r0,
        angle_idx=angle_idx, angle_k=angle_k, angle_theta0=angle_t0,
        torsion_idx=torsion_idx, torsion_k=t_k, torsion_n=t_n, torsion_phase=t_phase,
        lj_sigma=pad1(system.lj_sigma),
        lj_epsilon=pad1(system.lj_epsilon),
        scale_coul=scale_coul,
        scale_lj=scale_lj,
        gb_radii=pad1(system.gb_radii, 0.15) if has_gb else system.gb_radii,
        gb_screen=pad1(system.gb_screen, 0.0) if has_gb else system.gb_screen,
    )


def stack_systems(
    systems: Sequence[AmberSystem], v_pad: Optional[int] = None
) -> AmberSystem:
    """Stack same-shape systems leaf-wise -> batched system for vmap.
    ``v_pad`` forces the padded atom count (e.g. to match a bucketed
    DenseBatch width)."""
    v_max = max(max(s.num_atoms for s in systems), v_pad or 0)
    max_terms = {
        "bonds": max(s.bond_idx.shape[0] for s in systems),
        "angles": max(s.angle_idx.shape[0] for s in systems),
        "torsions": max(s.torsion_idx.shape[0] for s in systems),
    }
    padded = [pad_system(s, v_max, max_terms) for s in systems]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *padded)


def batched_mixed_potential(stacked: AmberSystem, coords: jnp.ndarray) -> jnp.ndarray:
    """[B, V, 3] with per-element system parameters -> [B] kJ/mol."""
    return jax.vmap(potential_energy)(stacked, coords)


class EnergyProvider:
    """Walks pdb_dirs for `{name}-traj-state0.pdb` files, builds and caches
    AmberSystems (FIFO, like the reference's cache_size=8 provider), and
    evaluates mixed-molecule batches via stacked systems."""

    def __init__(
        self,
        pdb_dirs: Sequence[str],
        cache_size: int = 64,
        temperature: float = 310.0,
    ):
        self.pdb_dirs = list(pdb_dirs)
        self.cache_size = cache_size
        self.temperature = temperature
        self._paths: Dict[str, str] = {}
        for d in self.pdb_dirs:
            for root, _, files in os.walk(d):
                for f in files:
                    if f.endswith("-traj-state0.pdb"):
                        self._paths.setdefault(
                            f[: -len("-traj-state0.pdb")], os.path.join(root, f)
                        )
        self._cache: "OrderedDict[str, AmberSystem]" = OrderedDict()
        self._stack_cache: "OrderedDict[Tuple, AmberSystem]" = OrderedDict()

    @property
    def kT(self) -> float:
        return kbT(self.temperature)

    def get_system(self, name: str) -> AmberSystem:
        if name in self._cache:
            self._cache.move_to_end(name)
            return self._cache[name]
        if name not in self._paths:
            raise KeyError(f"no state0 PDB found for {name!r} under {self.pdb_dirs}")
        system, _ = build_system(parse_pdb(self._paths[name]))
        self._cache[name] = system
        if len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)
        return system

    def get_masses(self, name: str) -> jnp.ndarray:
        return self.get_system(name).masses

    def stacked_for(self, names: Sequence[str], v_pad: Optional[int] = None) -> AmberSystem:
        """Batched system for one name per batch element (cached per name
        tuple)."""
        key = (tuple(names), v_pad)
        if key in self._stack_cache:
            self._stack_cache.move_to_end(key)
            return self._stack_cache[key]
        systems = [self.get_system(n) for n in names]
        if v_pad is not None:
            v_max = max(max(s.num_atoms for s in systems), v_pad)
            max_terms = {
                "bonds": max(s.bond_idx.shape[0] for s in systems),
                "angles": max(s.angle_idx.shape[0] for s in systems),
                "torsions": max(s.torsion_idx.shape[0] for s in systems),
            }
            systems = [pad_system(s, v_max, max_terms) for s in systems]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *systems)
        self._stack_cache[key] = stacked
        if len(self._stack_cache) > self.cache_size:
            self._stack_cache.popitem(last=False)
        return stacked

    def batch_potential(
        self, names: Sequence[str], coords: jnp.ndarray
    ) -> jnp.ndarray:
        """[B, V_pad, 3] -> [B] in kT units."""
        stacked = self.stacked_for(names, v_pad=coords.shape[1])
        return batched_mixed_potential(stacked, coords) / self.kT
