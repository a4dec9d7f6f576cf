"""Multi-molecule energy provider: padding exactness + mixed batches."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.energy import potential_energy
from timewarp_tpu.physics.provider import (
    EnergyProvider,
    batched_mixed_potential,
    pad_system,
    stack_systems,
)

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"
OLX_PDB = "/root/reference/testdata/output/2olx-traj-state0.pdb"


def test_padded_system_energy_is_exact():
    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    coords = jnp.asarray(topo.positions)
    e_ref = float(potential_energy(system, coords))

    padded = pad_system(system, topo.num_atoms + 10)
    # Dummies at the origin (worst case: coincident with each other).
    coords_pad = jnp.concatenate([coords, jnp.zeros((10, 3))], axis=0)
    e_pad = float(potential_energy(padded, coords_pad))
    assert np.isfinite(e_pad)
    assert abs(e_pad - e_ref) < 0.05, (e_pad, e_ref)

    # Forces on real atoms unchanged; dummies force-free.
    g_ref = jax.grad(lambda c: potential_energy(system, c))(coords)
    g_pad = jax.grad(lambda c: potential_energy(padded, c))(coords_pad)
    np.testing.assert_allclose(np.asarray(g_pad[:22]), np.asarray(g_ref), atol=0.5)
    np.testing.assert_allclose(np.asarray(g_pad[22:]), 0.0, atol=1e-3)


def test_stacked_mixed_batch():
    topo_a = parse_pdb(AD_PDB)
    topo_b = parse_pdb(OLX_PDB)
    sys_a, _ = build_system(topo_a)
    sys_b, _ = build_system(topo_b)
    stacked = stack_systems([sys_a, sys_b])
    V = stacked.masses.shape[1]
    coords = jnp.zeros((2, V, 3))
    coords = coords.at[0, :22].set(jnp.asarray(topo_a.positions))
    coords = coords.at[1, :65].set(jnp.asarray(topo_b.positions))
    e = np.asarray(batched_mixed_potential(stacked, coords))
    e_a = float(potential_energy(sys_a, jnp.asarray(topo_a.positions)))
    e_b = float(potential_energy(sys_b, jnp.asarray(topo_b.positions)))
    np.testing.assert_allclose(e[0], e_a, atol=0.1)
    np.testing.assert_allclose(e[1], e_b, atol=0.1)


def test_provider_walks_and_caches(tmp_path):
    provider = EnergyProvider(["/root/reference/testdata/output"], cache_size=2)
    assert "2olx" in provider._paths and "1hgv" in provider._paths
    s = provider.get_system("2olx")
    assert s.num_atoms == 65
    masses = provider.get_masses("2olx")
    assert masses.shape == (65,)
    with pytest.raises(KeyError):
        provider.get_system("nope")

    # Mixed batch through the provider.
    topo = parse_pdb(OLX_PDB)
    coords = jnp.tile(jnp.asarray(topo.positions)[None], (3, 1, 1))
    e = np.asarray(provider.batch_potential(["2olx"] * 3, coords))
    assert np.isfinite(e).all()
    assert np.allclose(e, e[0], atol=1e-3)
