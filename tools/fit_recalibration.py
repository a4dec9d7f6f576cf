"""Fit the internal-coordinate proposal recalibration for a trained flow.

Draws proposals from the checkpoint at conditioning states sampled from the
MD dataset, extracts z-matrix internals of proposals vs data frames, fits
the per-bond/per-angle affine (models/recalibration.py), and reports the
proposal potential-energy excess before/after the map -- the decisive
number (ROUND4 item 1: dE_pot median +30..40 kT concentrated in bond and
angle channels).

Usage:
  python tools/fit_recalibration.py runs/ad_r4_base.pkl runs/ad_dataC.npz \
      --out runs/recal_r4.pkl [--states 64] [--samples 32] [--cpu]
"""
import argparse
import pickle
import sys

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.models.recalibration import (
    apply_recalibration,
    build_zmatrix,
    extract_internals,
    fit_recalibration,
    save_recalibration,
)
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.sampling.mh import make_amber_energy, make_flow_proposal

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("params")
    ap.add_argument("data")
    ap.add_argument("--out", default="runs/recal_r4.pkl")
    ap.add_argument("--pdb", default=AD_PDB)
    ap.add_argument("--states", type=int, default=64)
    ap.add_argument("--samples", type=int, default=32, help="proposals per state")
    ap.add_argument("--data-frames", type=int, default=4096)
    ap.add_argument("--no-angles", action="store_true")
    ap.add_argument("--scale-clip", type=float, default=4.0)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--ff", type=int, default=2048)
    ap.add_argument("--coupling", type=int, default=8)
    ap.add_argument("--enc-layers", type=int, default=3)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from tools.diagnose_mh import build_ad_model

    topo = parse_pdb(args.pdb)
    system, _ = build_system(topo)
    V = topo.num_atoms
    md = np.load(args.data)
    coords = md["coords"].reshape(-1, V, 3)
    velocs = md["velocs"].reshape(-1, V, 3) if "velocs" in md else None

    model = build_ad_model(args)
    with open(args.params, "rb") as f:
        params = jax.device_put(pickle.load(f))

    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    propose_fn, _ = make_flow_proposal(
        model, atom_types, mask, temperature=args.temperature
    )
    energy_fn = make_amber_energy(system)

    # --- draw model samples at dataset conditioning states ---
    rng = np.random.default_rng(0)
    idx = rng.choice(coords.shape[0], size=args.states, replace=False)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def draw(x_coords, k):
        kv, kp = jax.random.split(k)
        xv = jax.random.normal(kv, (V, 3))
        yc, yv, _ = propose_fn(params, kp, x_coords, xv, args.samples)
        return yc, yv

    ys, yvs = [], []
    for i, j in enumerate(idx):
        key, k = jax.random.split(key)
        yc, yv = draw(jnp.asarray(coords[j]), k)
        ys.append(np.asarray(yc))
        yvs.append(np.asarray(yv))
    model_coords = np.concatenate(ys)  # [states*samples, V, 3]
    model_velocs = np.concatenate(yvs)

    data_idx = rng.choice(
        coords.shape[0], size=min(args.data_frames, coords.shape[0]), replace=False
    )
    data_coords = coords[data_idx]
    # The MH protocol resamples unit-variance velocities (random_velocs), so
    # the velocity-channel target is N(0,1) regardless of the dataset.
    data_velocs = rng.standard_normal(model_velocs.shape).astype(np.float32)

    zm = build_zmatrix(np.asarray(system.bond_idx), V, topo.positions)
    affine = fit_recalibration(
        zm,
        model_coords,
        data_coords,
        model_velocs=model_velocs,
        data_velocs=data_velocs,
        scale_clip=(1.0 / args.scale_clip, args.scale_clip),
        calibrate_angles=not args.no_angles,
    )

    # --- report: marginal stats + proposal energy excess before/after ---
    ex = jax.jit(jax.vmap(lambda c: extract_internals(c, zm)))
    mi = jax.device_get(ex(jnp.asarray(model_coords)))
    di = jax.device_get(ex(jnp.asarray(data_coords[: model_coords.shape[0]])))
    r_ratio = mi["r"][:, 1:].std(0) / (di["r"][:, 1:].std(0) + 1e-12)
    th_ratio = mi["theta"][:, 2:].std(0) / (di["theta"][:, 2:].std(0) + 1e-12)
    print(
        f"model/data std ratio: bonds median {np.median(r_ratio):.3f} "
        f"(max {r_ratio.max():.3f}), angles median {np.median(th_ratio):.3f} "
        f"(max {th_ratio.max():.3f}); v_scale {affine.v_scale:.4f}"
    )

    kT = float(kbT())
    e_x = np.asarray(
        jax.device_get(energy_fn(jnp.asarray(coords[idx])))
    )  # [states] kT
    e_before = np.asarray(jax.device_get(energy_fn(jnp.asarray(model_coords))))
    mapped, _ = jax.jit(
        jax.vmap(lambda c: apply_recalibration(c, zm, affine))
    )(jnp.asarray(model_coords))
    e_after = np.asarray(jax.device_get(energy_fn(mapped)))
    ex_rep = np.repeat(e_x, args.samples)
    print(
        f"proposal dE_pot median: before {np.median(e_before - ex_rep):+.1f} kT, "
        f"after {np.median(e_after - ex_rep):+.1f} kT "
        f"(mean {np.mean(e_before - ex_rep):+.1f} -> {np.mean(e_after - ex_rep):+.1f})"
    )

    save_recalibration(args.out, zm, affine)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
