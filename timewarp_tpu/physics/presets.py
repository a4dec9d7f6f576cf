"""Simulation/force-field presets mirroring the reference's preset table
(reference: simulation/md.py:15-187).

The reference resolves a dataset name to a preset, and a preset to
(force field XMLs, integrator, T, friction, dt):

- ``amber99-implicit-old``: amber99sbildn.xml + amber99_obc.xml (GBSAOBCForce
  = OBC-II, amber99_obc radii), plain LangevinIntegrator. Datasets:
  T1-peptides, HP-1400, HP-4000, alanine-dipeptide (AD-1).
- ``amber99-implicit``: same force field, LangevinMiddleIntegrator.
- ``amber14-implicit``: amber14-all.xml + implicit/obc1.xml (OBC-I, mbondi2
  radii), 2 nm CutoffNonPeriodic, LangevinMiddleIntegrator. Datasets:
  T1B-peptides, all 2AA/4AA, AD-3.
- ``amber14-explicit``: amber14-all.xml + TIP3P-FB water, PME. NOT
  implemented here -- explicit solvent / PME is out of scope for the
  implicit-solvent sampling product (the reference never trains or
  evaluates on explicit-solvent data either; the preset exists only in its
  data-generation tooling).

All presets share T=310 K, friction 0.3/ps, dt=0.5 fs.

Honest parity note (bonded tables): this image has no OpenMM and no
network, so the ff14SB bonded refits behind amber14-all.xml (Maier et al.
2015: side-chain and backbone torsion refits over ff99SB; bonds, angles,
LJ, and charges are unchanged from the ff99 lineage) cannot be
transcribed or golden-validated here. ``amber14-implicit`` therefore uses
the ff99SB-ildn torsion tables with the amber14 *nonbonded/GB model*
(OBC-I + mbondi2 radii + 2 nm cutoff), and says so loudly via
``BuildReport`` and a warning. Everything this framework generates itself
is self-consistent by construction (data generation, MH accept/reject,
and training losses all use the same potential); the gap only matters
when scoring trajectories produced externally by real amber14.
"""
import dataclasses
import warnings
from typing import Optional, Tuple

from timewarp_tpu.data.pdb import Topology
from timewarp_tpu.physics.amber.build import BuildReport, build_system
from timewarp_tpu.physics.system import AmberSystem

# Dataset name -> preset name (reference: simulation/md.py:31-44).
DATASET_PRESETS = {
    "T1B-peptides": "amber14-implicit",
    "T1-peptides": "amber99-implicit-old",
    "HP-1400": "amber99-implicit-old",
    "HP-4000": "amber99-implicit-old",
    "alanine-dipeptide": "amber99-implicit-old",
}


@dataclasses.dataclass(frozen=True)
class SimPreset:
    name: str
    gb_model: str  # obc1 | obc2
    gb_radii_set: str  # amber99_obc | mbondi2
    cutoff: Optional[float]  # nm, None = no cutoff
    integrator: str  # "langevin" (legacy) | "langevin-middle" (BAOAB)
    temperature: float = 310.0  # K
    friction: float = 0.3  # 1/ps
    timestep: float = 0.0005  # ps (0.5 fs)
    ff14_torsion_gap: bool = False  # bonded tables are ff99SB-ildn, not ff14SB


PRESETS = {
    "amber99-implicit-old": SimPreset(
        name="amber99-implicit-old",
        gb_model="obc2",
        gb_radii_set="amber99_obc",
        cutoff=2.0,
        integrator="langevin",
    ),
    "amber99-implicit": SimPreset(
        name="amber99-implicit",
        gb_model="obc2",
        gb_radii_set="amber99_obc",
        cutoff=2.0,
        integrator="langevin-middle",
    ),
    "amber14-implicit": SimPreset(
        name="amber14-implicit",
        gb_model="obc1",
        gb_radii_set="mbondi2",
        cutoff=2.0,
        integrator="langevin-middle",
        ff14_torsion_gap=True,
    ),
}


def get_preset(preset_or_dataset_name: str) -> SimPreset:
    """Resolve a preset or dataset name to a SimPreset (reference:
    simulation/md.py:46-98)."""
    name = DATASET_PRESETS.get(preset_or_dataset_name, preset_or_dataset_name)
    if name == "amber14-explicit":
        raise NotImplementedError(
            "amber14-explicit (TIP3P-FB + PME) is data-generation-only in the "
            "reference and out of scope here; use an implicit preset"
        )
    if name not in PRESETS:
        raise ValueError(
            f"unknown preset {preset_or_dataset_name!r}; known: "
            f"{sorted(PRESETS)} + datasets {sorted(DATASET_PRESETS)}"
        )
    return PRESETS[name]


def build_system_from_preset(
    topology: Topology,
    preset_or_dataset_name: str = "amber99-implicit-old",
    strict: bool = True,
) -> Tuple[AmberSystem, BuildReport]:
    """build_system with a preset's nonbonded/GB model applied.

    The returned system's energies use the preset's GB variant, radii set
    and cutoff; bonded tables are the ff99SB-ildn set for every preset
    (see module docstring for the amber14 torsion-gap disclosure).
    """
    preset = get_preset(preset_or_dataset_name)
    if preset.ff14_torsion_gap:
        warnings.warn(
            "amber14-implicit: using ff14SB's nonbonded/GB model (OBC-I, "
            "mbondi2 radii, 2 nm cutoff) but ff99SB-ildn bonded tables -- "
            "the ff14SB torsion refits are not transcribable in this "
            "offline image. Self-generated data is self-consistent; "
            "externally generated amber14 trajectories will show torsion-"
            "level energy differences.",
            stacklevel=2,
        )
    return build_system(
        topology,
        cutoff=preset.cutoff,
        gb_model=preset.gb_model,
        gb_radii_set=preset.gb_radii_set,
        strict=strict,
    )


def langevin_config(preset_or_dataset_name: str):
    """The preset's LangevinConfig (import deferred: integrator pulls jax)."""
    from timewarp_tpu.physics.integrator import LangevinConfig

    p = get_preset(preset_or_dataset_name)
    return LangevinConfig(
        temperature=p.temperature,
        friction=p.friction,
        timestep=p.timestep,
        scheme="legacy" if p.integrator == "langevin" else "middle",
    )
