from timewarp_tpu.physics.system import AmberSystem
from timewarp_tpu.physics.energy import potential_energy, potential_energy_terms, forces

__all__ = ["AmberSystem", "potential_energy", "potential_energy_terms", "forces"]
