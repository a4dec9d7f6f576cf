"""Internal-coordinate packing bijection (models/internal_coords.py):
round-trips, frame handling, torsion-relative packing, and measure-
logdet consistency with the autodiff-validated replace_internals."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.models.internal_coords import (
    internal_channel_mask,
    pack_internals,
    pack_relative,
    unpack_internals,
    unpack_relative,
    wrap_angle,
)
from timewarp_tpu.models.channel_swap import replace_internals
from timewarp_tpu.models.recalibration import build_zmatrix, extract_internals
from timewarp_tpu.physics.amber.build import build_system

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


@pytest.fixture(scope="module")
def setup():
    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    coords = jnp.asarray(topo.positions)
    zm = build_zmatrix(np.asarray(system.bond_idx), coords.shape[0], topo.positions)
    return coords, zm


def test_channel_mask(setup):
    coords, zm = setup
    m = internal_channel_mask(zm)
    assert m.sum() == 3 * zm.num_atoms - 6


def test_pack_unpack_round_trip(setup):
    coords, zm = setup
    rng = np.random.default_rng(0)
    y = coords + 0.01 * jnp.asarray(rng.standard_normal(coords.shape), jnp.float32)
    p, ld_pack = pack_internals(y, zm)
    y2, ld_unpack = unpack_internals(p, zm, y)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=2e-5)
    np.testing.assert_allclose(float(ld_pack) + float(ld_unpack), 0.0, atol=1e-3)
    # packed matches extract_internals on the shared channels
    s = extract_internals(y, zm)
    np.testing.assert_allclose(np.asarray(p[:, 0]), np.asarray(s["r"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p[2:, 1]), np.asarray(s["theta"])[2:], atol=1e-5
    )


def test_unpack_into_other_frame_preserves_internals(setup):
    """Rebuilding the same internals in a different conformation's frame
    yields a rotated/translated copy: internals re-extract identically."""
    coords, zm = setup
    rng = np.random.default_rng(1)
    y = coords + 0.01 * jnp.asarray(rng.standard_normal(coords.shape), jnp.float32)
    x = coords + 0.01 * jnp.asarray(rng.standard_normal(coords.shape), jnp.float32)
    p, _ = pack_internals(y, zm)
    y_in_x, _ = unpack_internals(p, zm, x)
    p2, _ = pack_internals(y_in_x, zm)
    m = internal_channel_mask(zm)
    # wrap the torsion channel difference
    diff = np.array(p2 - p)
    diff[:, 2] = np.asarray(wrap_angle(jnp.asarray(diff[:, 2])))
    np.testing.assert_allclose(diff * m, 0.0, atol=5e-4)
    # COM preserved from the frame conformation
    np.testing.assert_allclose(
        np.asarray(y_in_x.mean(0)), np.asarray(x.mean(0)), atol=1e-5
    )


def test_pack_relative_round_trip(setup):
    coords, zm = setup
    rng = np.random.default_rng(2)
    y = coords + 0.02 * jnp.asarray(rng.standard_normal(coords.shape), jnp.float32)
    x = coords + 0.02 * jnp.asarray(rng.standard_normal(coords.shape), jnp.float32)
    p, ld1 = pack_relative(y, x, zm)
    y2, ld2 = unpack_relative(p, x, zm)
    p2, _ = pack_relative(y2, x, zm)
    m = internal_channel_mask(zm)
    diff = np.array(p2 - p)
    diff[:, 2] = np.asarray(wrap_angle(jnp.asarray(diff[:, 2])))
    np.testing.assert_allclose(diff * m, 0.0, atol=5e-4)
    np.testing.assert_allclose(float(ld1) + float(ld2), 0.0, atol=1e-3)


def test_logdet_consistent_with_replace_internals(setup):
    """Editing stiff internals via unpack(edited pack) must match
    replace_internals (whose logdet is autodiff-validated through
    apply_recalibration's machinery) in both coordinates and logdet."""
    coords, zm = setup
    rng = np.random.default_rng(3)
    y = coords + 0.005 * jnp.asarray(rng.standard_normal(coords.shape), jnp.float32)
    s = extract_internals(y, zm)
    new_r = s["r"] * (1.0 + 0.05 * jnp.asarray(rng.uniform(-1, 1, zm.num_atoms), jnp.float32))
    new_th = s["theta"] + 0.05 * jnp.asarray(rng.uniform(-1, 1, zm.num_atoms), jnp.float32)

    y_ref, ld_ref = replace_internals(y, zm, new_r, new_th)

    p, ld_pack = pack_internals(y, zm)
    p_edit = p.at[:, 0].set(jnp.where(jnp.arange(zm.num_atoms) >= 1, new_r, p[:, 0]))
    p_edit = p_edit.at[:, 1].set(
        jnp.where(jnp.arange(zm.num_atoms) >= 2, new_th, p[:, 1])
    )
    y_new, ld_unpack = unpack_internals(p_edit, zm, y)

    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref), atol=3e-5)
    np.testing.assert_allclose(
        float(ld_pack) + float(ld_unpack), float(ld_ref), atol=1e-3
    )
