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
    ap.add_argument("--scale-power", type=float, default=1.0,
                    help="1.0 = full variance matching, 0.0 = shift-only "
                         "(mean-bias removal; preserves the flow's sharp "
                         "tracking conditionals)")
    ap.add_argument("--sweep", type=str, default=None,
                    help="comma-separated scale_power values: probe the full "
                         "MH exponent (dE + dlogp) at each and report "
                         "acceptance; saves the best-by-mean-acceptance fit")
    ap.add_argument("--conditional", action="store_true",
                    help="conditional moment matching (fit_conditional_"
                         "recalibration): match the proposal's per-coordinate "
                         "conditional slope/intercept/residual to MD pairs "
                         "instead of the marginals")
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
    propose_fn, reverse_logp_fn = make_flow_proposal(
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

    # MD pairs at the step width (consecutive frames of each walker) for
    # conditional moment matching.
    raw = md["coords"]
    pair_x = raw[:, :-1].reshape(-1, V, 3)
    pair_y = raw[:, 1:].reshape(-1, V, 3)
    pidx = rng.choice(pair_x.shape[0], size=min(4096, pair_x.shape[0]), replace=False)
    model_cond = np.repeat(coords[idx], args.samples, axis=0)

    def do_fit(power):
        if args.conditional:
            from timewarp_tpu.models.recalibration import (
                fit_conditional_recalibration,
            )

            return fit_conditional_recalibration(
                zm, model_cond, model_coords, pair_x[pidx], pair_y[pidx],
                model_velocs=model_velocs, data_velocs=data_velocs,
                scale_clip=(1.0 / args.scale_clip, args.scale_clip),
                calibrate_angles=not args.no_angles, scale_power=power,
            )
        return fit_recalibration(
            zm, model_coords, data_coords,
            model_velocs=model_velocs, data_velocs=data_velocs,
            scale_clip=(1.0 / args.scale_clip, args.scale_clip),
            calibrate_angles=not args.no_angles, scale_power=power,
        )

    affine = do_fit(args.scale_power)

    # --- report: marginal stats + proposal energy excess before/after ---
    ex = jax.jit(jax.vmap(lambda c: extract_internals(c, zm)))
    mi = jax.device_get(ex(jnp.asarray(model_coords)))
    di = jax.device_get(ex(jnp.asarray(data_coords[: model_coords.shape[0]])))
    r_ratio = mi["r"][:, 1:].std(0) / (di["r"][:, 1:].std(0) + 1e-12)
    th_ratio = mi["theta"][:, 2:].std(0) / (di["theta"][:, 2:].std(0) + 1e-12)
    # systematic mean bias in units of the DATA std: the part a shift-only
    # recalibration removes
    r_bias = (mi["r"][:, 1:].mean(0) - di["r"][:, 1:].mean(0)) / (
        di["r"][:, 1:].std(0) + 1e-12
    )
    th_bias = (mi["theta"][:, 2:].mean(0) - di["theta"][:, 2:].mean(0)) / (
        di["theta"][:, 2:].std(0) + 1e-12
    )
    print(
        f"model/data std ratio: bonds median {np.median(r_ratio):.3f} "
        f"(max {r_ratio.max():.3f}), angles median {np.median(th_ratio):.3f} "
        f"(max {th_ratio.max():.3f}); v_scale {affine.v_scale:.4f}"
    )
    print(
        f"mean bias (data-sigma units): bonds |median| "
        f"{np.median(np.abs(r_bias)):.3f} (max {np.abs(r_bias).max():.3f}), "
        f"angles |median| {np.median(np.abs(th_bias)):.3f} "
        f"(max {np.abs(th_bias).max():.3f}); implied energy cost "
        f"~{0.5 * (r_bias**2).sum() + 0.5 * (th_bias**2).sum():.1f} kT"
    )

    kT = float(kbT())
    e_x = np.asarray(
        jax.device_get(energy_fn(jnp.asarray(coords[idx])))
    )  # [states] kT
    e_before = np.asarray(jax.device_get(energy_fn(jnp.asarray(model_coords))))
    if affine.conditional:
        from timewarp_tpu.models.recalibration import extract_internals as _exi

        conds = jax.jit(jax.vmap(lambda c: _exi(c, zm)))(jnp.asarray(model_cond))
        mapped, _ = jax.jit(
            jax.vmap(
                lambda c, cr, ct: apply_recalibration(
                    c, zm, affine, cond_internals={"r": cr, "theta": ct}
                )
            )
        )(jnp.asarray(model_coords), conds["r"], conds["theta"])
    else:
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

    if args.sweep:
        from timewarp_tpu.models.recalibration import wrap_proposal

        powers = [float(p) for p in args.sweep.split(",")]
        # Two probe states (spread through the data) x 256 proposals each;
        # the full MH exponent including the reverse density, which is what
        # full variance matching destroys (ROUND4: dlogp +563 at kappa=1).
        probe_states = [coords[idx[0]], coords[idx[len(idx) // 2]]]
        best = (None, -1.0, None)
        kin = lambda v: 0.5 * jnp.sum(v**2, axis=(-2, -1))
        for p in powers:
            aff_p = do_fit(p)
            p_fn, r_fn = wrap_proposal(propose_fn, reverse_logp_fn, zm, aff_p)

            @jax.jit
            def probe(xc, k):
                k1, k2 = jax.random.split(k)
                xv = jax.random.normal(k1, (V, 3))
                yc, yv, lp_xy = p_fn(params, k2, xc, xv, 64)
                e_xp = energy_fn(xc)
                e_yp = energy_fn(yc)
                lp_yx = r_fn(params, yc, yv, xc, xv)
                expo = (e_yp - e_xp) + (kin(yv) - kin(xv)) + lp_xy - lp_yx
                return e_yp - e_xp, lp_xy - lp_yx, expo

            des, dls, exps = [], [], []
            for si, st in enumerate(probe_states):
                for rep in range(4):
                    de, dl, ex_ = probe(
                        jnp.asarray(st), jax.random.PRNGKey(100 + 10 * si + rep)
                    )
                    des.append(np.asarray(de))
                    dls.append(np.asarray(dl))
                    exps.append(np.asarray(ex_))
            des, dls, exps = map(np.concatenate, (des, dls, exps))
            acc = np.exp(np.minimum(-exps, 0.0))
            print(
                f"  kappa={p:<5} dE_pot med {np.median(des):+7.1f}  "
                f"dlogp med {np.median(dls):+8.1f}  exponent med "
                f"{np.median(exps):+8.1f}  acc mean {acc.mean():.4f}  "
                f"P(acc>1%) {(acc > 0.01).mean():.3f}",
                flush=True,
            )
            if acc.mean() > best[1]:
                best = (p, acc.mean(), aff_p)
        print(f"best kappa {best[0]} (mean acc {best[1]:.4f})")
        affine = best[2]

    save_recalibration(args.out, zm, affine)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
