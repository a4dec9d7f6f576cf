"""Fit the involutive stiff-channel swap (models/channel_swap.py) for a
trained flow and probe the full MH exponent it produces.

Usage:
  python tools/fit_channel_swap.py runs/ad_r4_base.pkl runs/ad_dataC.npz \
      --out runs/swap_r4.pkl [--states 48] [--samples 16] [--cpu]
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
from timewarp_tpu.models.channel_swap import (
    fit_channel_ar,
    make_swap_proposal,
    save_channel_ar,
)
from timewarp_tpu.models.recalibration import build_zmatrix
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.sampling.mh import make_amber_energy, make_flow_proposal

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("params")
    ap.add_argument("data")
    ap.add_argument("--out", default="runs/swap_r4.pkl")
    ap.add_argument("--pdb", default=AD_PDB)
    ap.add_argument("--states", type=int, default=48)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--no-angles", action="store_true")
    ap.add_argument("--mvn", action="store_true",
                    help="joint-Gaussian stiff statistics (ChannelMVN) "
                         "instead of per-coordinate AR")
    ap.add_argument("--probe-k", type=int, default=64)
    ap.add_argument("--probe-reps", type=int, default=4)
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
    raw = md["coords"]

    model = build_ad_model(args)
    with open(args.params, "rb") as f:
        params = jax.device_put(pickle.load(f))
    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    propose_fn, reverse_logp_fn = make_flow_proposal(
        model, atom_types, mask, temperature=args.temperature
    )
    energy_fn = make_amber_energy(system)

    rng = np.random.default_rng(0)
    idx = rng.choice(coords.shape[0], size=args.states, replace=False)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def draw(x_coords, k):
        kv, kp = jax.random.split(k)
        xv = jax.random.normal(kv, (V, 3))
        yc, yv, _ = propose_fn(params, kp, x_coords, xv, args.samples)
        return yc, yv

    ys = []
    for j in idx:
        key, k = jax.random.split(key)
        yc, _ = draw(jnp.asarray(coords[j]), k)
        ys.append(np.asarray(yc))
    model_coords = np.concatenate(ys)
    model_cond = np.repeat(coords[idx], args.samples, axis=0)

    pair_x = raw[:, :-1].reshape(-1, V, 3)
    pair_y = raw[:, 1:].reshape(-1, V, 3)
    pidx = rng.choice(pair_x.shape[0], size=min(8192, pair_x.shape[0]), replace=False)

    zm = build_zmatrix(np.asarray(system.bond_idx), V, topo.positions)
    if args.mvn:
        from timewarp_tpu.models.channel_swap import (
            fit_channel_mvn,
            make_swap_proposal_mvn,
            save_channel_mvn,
        )

        mv = fit_channel_mvn(
            zm, model_cond, model_coords, pair_x[pidx], pair_y[pidx]
        )
        print(
            f"mvn fit: |L_d| diag med {np.median(np.diag(mv.L_d)):.5f}, "
            f"|L_m| diag med {np.median(np.diag(mv.L_m)):.5f}"
        )
    ar = fit_channel_ar(
        zm, model_cond, model_coords, pair_x[pidx], pair_y[pidx],
        swap_angles=not args.no_angles,
    )
    print(
        f"data AR:  bond beta med {np.median(ar.r_b_d[1:]):+.3f} resid med "
        f"{np.median(ar.r_s_d[1:]):.5f} | angle beta med "
        f"{np.median(ar.th_b_d[2:]):+.3f} resid med {np.median(ar.th_s_d[2:]):.5f}"
    )
    print(
        f"model AR: bond beta med {np.median(ar.r_b_m[1:]):+.3f} resid med "
        f"{np.median(ar.r_s_m[1:]):.5f} | angle beta med "
        f"{np.median(ar.th_b_m[2:]):+.3f} resid med {np.median(ar.th_s_m[2:]):.5f}"
    )

    # --- probe the full exponent, swap vs plain ---
    if args.mvn:
        p_sw, r_sw = make_swap_proposal_mvn(propose_fn, reverse_logp_fn, zm, mv)
    else:
        p_sw, r_sw = make_swap_proposal(propose_fn, reverse_logp_fn, zm, ar)
    kin = lambda v: 0.5 * jnp.sum(v**2, axis=(-2, -1))

    def make_probe(p_fn, r_fn):
        @jax.jit
        def probe(xc, k):
            k1, k2 = jax.random.split(k)
            xv = jax.random.normal(k1, (V, 3))
            yc, yv, lp_xy = p_fn(params, k2, xc, xv, args.probe_k)
            expo = (
                (energy_fn(yc) - energy_fn(xc))
                + (kin(yv) - kin(xv))
                + lp_xy
                - r_fn(params, yc, yv, xc, xv)
            )
            return energy_fn(yc) - energy_fn(xc), expo

        return probe

    probe_states = [coords[idx[0]], coords[idx[len(idx) // 2]]]
    for tag, fns in (("plain", (propose_fn, reverse_logp_fn)), ("swap", (p_sw, r_sw))):
        probe = make_probe(*fns)
        des, exps = [], []
        for si, st in enumerate(probe_states):
            for rep in range(args.probe_reps):
                de, ex_ = probe(
                    jnp.asarray(st), jax.random.PRNGKey(100 + 10 * si + rep)
                )
                des.append(np.asarray(de))
                exps.append(np.asarray(ex_))
        des, exps = np.concatenate(des), np.concatenate(exps)
        acc = np.exp(np.minimum(-exps, 0.0))
        print(
            f"{tag:6s} dE_pot med {np.median(des):+7.1f}  exponent med "
            f"{np.median(exps):+8.1f} std {exps.std():6.1f}  acc mean "
            f"{acc.mean():.4f}  P(acc>1%) {(acc > 0.01).mean():.3f}",
            flush=True,
        )

    if args.mvn:
        save_channel_mvn(args.out, zm, mv)
    else:
        save_channel_ar(args.out, zm, ar)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
