"""timewarp_tpu: a TPU-native rebuild of the Timewarp MD-accelerator framework.

The framework learns a conditional density model p(y|x) over molecular states
(positions, velocities) separated by a large MD time step, and uses it as the
proposal distribution of a Metropolis-Hastings chain whose accept/reject step
is computed with a pure-JAX AMBER implicit-solvent energy function -- so the
entire sampling loop runs fused on a TPU with no host round-trips.

Subpackages
-----------
- ``data``      batch pytrees, PDB/NPZ loading, datasets, samplers
- ``models``    the conditional-density model zoo (RealNVP flows, CVAE, ...)
- ``physics``   AMBER force field, energies, Langevin integrator (all JAX)
- ``losses``    NLL / acceptance / energy losses
- ``training``  optax-based training runtime, checkpoints, logging
- ``sampling``  on-device Metropolis-Hastings + exploration
- ``parallel``  device-mesh helpers (data parallel over ICI)
- ``ops``       Pallas TPU kernels for the hot attention paths
"""

__version__ = "0.1.0"
