"""Physical constants in the MD unit system (nm, ps, kJ/mol, dalton, e)."""

# Boltzmann constant, kJ/(mol K) (CODATA via OpenMM's MOLAR_GAS_CONSTANT_R).
KB = 0.00831446261815324

# Coulomb constant 1/(4 pi eps0) in kJ nm / (mol e^2) (OpenMM's ONE_4PI_EPS0 / 10).
ONE_4PI_EPS0 = 138.935456

# Simulation presets (reference: simulation/md.py:76-95).
DEFAULT_TEMPERATURE = 310.0  # K
DEFAULT_FRICTION = 0.3  # 1/ps
DEFAULT_TIMESTEP = 0.0005  # ps (0.5 fs)

def kbT(temperature: float = DEFAULT_TEMPERATURE) -> float:
    return KB * temperature
