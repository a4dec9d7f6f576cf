"""Force-field/integrator preset table (reference: simulation/md.py:15-187)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.presets import (
    DATASET_PRESETS,
    PRESETS,
    build_system_from_preset,
    get_preset,
    langevin_config,
)

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def test_dataset_name_resolution():
    # reference: simulation/md.py:31-44
    assert get_preset("T1B-peptides").name == "amber14-implicit"
    assert get_preset("alanine-dipeptide").name == "amber99-implicit-old"
    assert get_preset("T1-peptides").name == "amber99-implicit-old"
    assert get_preset("amber14-implicit").name == "amber14-implicit"


def test_unknown_and_explicit_raise():
    with pytest.raises(ValueError):
        get_preset("no-such-preset")
    with pytest.raises(NotImplementedError):
        get_preset("amber14-explicit")


def test_shared_simulation_parameters():
    # T=310 K, friction 0.3/ps, dt 0.5 fs for every preset
    # (reference: simulation/md.py:76-95).
    for p in PRESETS.values():
        assert p.temperature == 310.0
        assert p.friction == 0.3
        assert p.timestep == pytest.approx(0.0005)


def test_amber14_system_flags_and_warning():
    topo = parse_pdb(AD_PDB)
    with pytest.warns(UserWarning, match="ff14SB"):
        system, _ = build_system_from_preset(topo, "amber14-implicit")
    assert system.gb_model == "obc1"
    assert system.cutoff == 2.0

    system99, _ = build_system_from_preset(topo, "amber99-implicit-old")
    assert system99.gb_model == "obc2"


def test_amber14_radii_differ_from_amber99():
    """mbondi2 vs amber99_obc GB radii must actually change the GB energy."""
    from timewarp_tpu.physics.energy import potential_energy

    topo = parse_pdb(AD_PDB)
    coords = jnp.asarray(topo.positions)
    with pytest.warns(UserWarning):
        s14, _ = build_system_from_preset(topo, "amber14-implicit")
    s99, _ = build_system_from_preset(topo, "amber99-implicit-old")
    e14 = float(potential_energy(s14, coords))
    e99 = float(potential_energy(s99, coords))
    assert np.isfinite(e14) and np.isfinite(e99)
    assert e14 != pytest.approx(e99, abs=1e-3)


def test_legacy_integrator_scheme():
    """The legacy (pre-12/2021) presets use OpenMM LangevinIntegrator's
    discretization; newer ones use BAOAB (reference: simulation/md.py:113-125).
    Both must hold temperature on a harmonic system."""
    from timewarp_tpu.physics.integrator import LangevinConfig, langevin_step_fn
    from timewarp_tpu.physics.system import AmberSystem

    assert langevin_config("alanine-dipeptide").scheme == "legacy"
    assert langevin_config("amber14-implicit").scheme == "middle"
    assert langevin_config("T1B-peptides").timestep == pytest.approx(0.0005)

    # 3 uncoupled harmonic "bonds" around the origin: equipartition check.
    topo = parse_pdb(AD_PDB)
    s, _ = build_system_from_preset(topo, "alanine-dipeptide")
    cfg = langevin_config("alanine-dipeptide")
    step = langevin_step_fn(s, cfg)

    def run(coords, velocs, key, n=2000):
        def body(c, k):
            coords, velocs = c
            return step(coords, velocs, k), None

        (coords, velocs), _ = jax.lax.scan(
            body, (coords, velocs), jax.random.split(key, n)
        )
        return coords, velocs

    coords = jnp.asarray(topo.positions)
    velocs = jnp.zeros_like(coords)
    coords, velocs = jax.jit(run)(coords, velocs, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(coords).all() and jnp.isfinite(velocs).all())
    # Kinetic energy near (3/2) V kT after equilibration (loose gate: the
    # legacy scheme's temperature error at dt=0.5fs is tiny for bonded H).
    from timewarp_tpu.physics.constants import kbT

    ke = float(0.5 * (jnp.asarray(s.masses)[:, None] * velocs**2).sum())
    target = 1.5 * topo.num_atoms * float(kbT(cfg.temperature))
    assert 0.4 * target < ke < 2.5 * target


def test_amber14_internal_golden_fixture():
    """Pin the amber14-implicit (OBC-I + mbondi2 + 2 nm cutoff) energy path
    against energies/forces committed FROM THIS IMPLEMENTATION (f64 CPU,
    tests/data/amber14_2olx_internal.npz, generated round 4): no external
    OpenMM validation can exist in-image (physics/presets.py disclosure),
    so this guards the GB-variant path against silent regressions the same
    way the amber99 golden test guards the validated path (VERDICT round 3,
    next-steps #8)."""
    topo = parse_pdb(
        "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-state0.pdb"
    )
    with pytest.warns(UserWarning, match="ff14SB"):
        system, _ = build_system_from_preset(topo, "amber14-implicit")
    from timewarp_tpu.physics.energy import forces, potential_energy_terms

    d = np.load("/root/repo/tests/data/amber14_2olx_internal.npz")
    pos = jnp.asarray(d["positions"])
    terms = jax.vmap(lambda p: potential_energy_terms(system, p))(pos)
    for k, v in terms.items():
        np.testing.assert_allclose(
            np.asarray(v), d[f"e_{k}"], rtol=2e-4, atol=0.5,
            err_msg=f"amber14 term {k} moved vs the committed fixture",
        )
    F = np.asarray(jax.vmap(lambda p: forces(system, p))(pos[:8]))
    err = np.linalg.norm(F - d["forces"][:8], axis=-1)
    scale = np.linalg.norm(d["forces"][:8], axis=-1).mean()
    assert np.median(err) / scale < 0.005, (np.median(err), scale)
