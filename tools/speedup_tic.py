"""Effective-sampling speed-up in TIC space: MH chain vs Langevin MD.

This is the reference paper's headline metric (BASELINE.md "Speed-up metric
used in paper figures"): fit TICA on the MD ensemble, project both the MD
chain and the MH chain, and compare effective samples per wall-second on
TIC-0/TIC-1 -- speedup = (ESS_frac_mh * states/s) / (ESS_frac_md * frames/s)
(reference: notebooks/Paper/speed-up-mcmc.ipynb cells 7-8,
utils/tica_utils.py:10-60). A chain that misses states in TIC(0,1) space
(normalized max-min-distance >= 0.3) records speed-up 0, exactly like the
notebook's missing-state check.

Protocol notes (single-chain basis, as in the notebook):
- The MD ESS fraction is estimated from the (many-walker) MD dataset itself,
  averaged over walkers; the MD wall rate is measured fresh on-device with a
  short timed Langevin run at the data's frame spacing.
- The MH chain is a fresh single chain from a single MD state (the honest
  flow-only protocol of tools/eval_r3.py); its wall rate is the measured
  steady-state rate including host bookkeeping.

Usage:
  python tools/speedup_tic.py runs/ad_r4_base.pkl runs/ad_dataC.npz \
      --chain-states 100000 --out runs/speedup_ad.json [--temperature 1.0] \
      [--md-steps 0] [--lagtime 100]
"""
import argparse
import json
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.physics.integrator import (
    maxwell_boltzmann_velocities,
    sample_trajectory,
)
from timewarp_tpu.sampling.mh import (
    MHConfig,
    make_amber_energy,
    make_flow_proposal,
    make_md_step_fn,
    sample_with_model,
)
from timewarp_tpu.utils.analysis import (
    TICAModel,
    autocorrelation,
    ess_per_sample,
    pooled_autocorrelation,
    tic_coverage_gap,
    tica_features_full,
)

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def tic_ess(tics: np.ndarray, axis: int) -> float:
    return ess_per_sample(autocorrelation(tics[:, axis]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("params")
    ap.add_argument("data")
    ap.add_argument("--pdb", default=AD_PDB)
    ap.add_argument("--chain-states", type=int, default=100_000)
    ap.add_argument("--md-probe-frames", type=int, default=100,
                    help="frames for the fresh timed MD-rate probe")
    ap.add_argument("--md-walkers", type=int, default=4)
    ap.add_argument("--steps-per-frame", type=int, default=1000)
    ap.add_argument("--lagtime", type=int, default=100)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--veloc-temperature", type=float, default=None)
    ap.add_argument("--recal", type=str, default=None,
                    help="fitted internal-coordinate recalibration pickle "
                         "(tools/fit_recalibration.py)")
    ap.add_argument("--md-steps", type=int, default=0,
                    help="interleaved MD steps per MH iteration (0 = flow-only)")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--out", default=None)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--ff", type=int, default=2048)
    ap.add_argument("--coupling", type=int, default=8)
    ap.add_argument("--enc-layers", type=int, default=3)
    args = ap.parse_args()

    topo = parse_pdb(args.pdb)
    system, _ = build_system(topo)
    V = topo.num_atoms
    md = np.load(args.data)
    md_coords = md["coords"]  # [W, T, V, 3]
    W, T = md_coords.shape[:2]
    print(f"MD data: {W} walkers x {T} frames", flush=True)

    # --- TICA fit on the MD ensemble (per-walker covariances) ---
    feats = [tica_features_full(md_coords[w], topo) for w in range(W)]
    model_tica = TICAModel.fit(feats, lag=args.lagtime, dim=2)
    tics_md = [model_tica.transform(f) for f in feats]
    tics_md_all = np.concatenate(tics_md)

    # MD ESS fraction: variance-weighted pooled autocorrelation over the
    # walkers (mean-of-per-walker-ESS is dominated by stuck walkers whose
    # flat TIC series fakes white noise -- pooled_autocorrelation docstring).
    ess_md0 = ess_per_sample(pooled_autocorrelation([t[:, 0] for t in tics_md]))
    ess_md1 = ess_per_sample(pooled_autocorrelation([t[:, 1] for t in tics_md]))
    print(f"MD ESS/sample (pooled): tic0 {ess_md0:.3e} tic1 {ess_md1:.3e}",
          flush=True)

    # --- fresh timed MD-rate probe (per-chain frames/s on this chip) ---
    Wm = args.md_walkers
    keys = jax.random.split(jax.random.PRNGKey(0), Wm)
    c0 = jnp.tile(jnp.asarray(md_coords[0, 0])[None], (Wm, 1, 1))
    v0 = jax.vmap(lambda k: maxwell_boltzmann_velocities(system, k))(keys)
    probe = jax.jit(
        jax.vmap(
            lambda c, v, k: sample_trajectory(
                system, c, v, k,
                num_frames=args.md_probe_frames,
                steps_per_frame=args.steps_per_frame,
            )
        )
    )
    probe(c0, v0, keys)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    tc, _ = probe(c0, v0, jax.random.split(jax.random.PRNGKey(1), Wm))
    tc.block_until_ready()
    md_wall = time.perf_counter() - t0
    md_frames_per_s = args.md_probe_frames / md_wall  # per chain
    print(
        f"MD rate probe: {Wm}x{args.md_probe_frames} frames in {md_wall:.1f}s "
        f"-> {md_frames_per_s:.2f} frames/s/chain "
        f"({md_frames_per_s * args.steps_per_frame:.0f} steps/s/chain)",
        flush=True,
    )

    # --- MH chain (fresh, single chain, single-state init) ---
    model = __import__("tools.diagnose_mh", fromlist=["build_ad_model"]).build_ad_model(args)
    with open(args.params, "rb") as f:
        params = jax.device_put(pickle.load(f))
    atom_types1 = jnp.asarray(topo.atom_types[None])
    mask1 = jnp.zeros((1, V), bool)
    recal = None
    if args.recal:
        from timewarp_tpu.models.recalibration import load_recalibration

        recal = load_recalibration(args.recal)
    propose_fn, reverse_logp_fn = make_flow_proposal(
        model, atom_types1, mask1,
        temperature=args.temperature, veloc_temperature=args.veloc_temperature,
        recalibration=recal,
    )
    energy_fn = make_amber_energy(system)
    cfg = MHConfig(num_proposal_steps=args.k, md_steps_current=args.md_steps)
    md_step_fn = make_md_step_fn(system) if args.md_steps > 0 else None
    t0 = time.perf_counter()
    chain_coords, _, accepted, stats = sample_with_model(
        params, propose_fn, reverse_logp_fn, energy_fn,
        jnp.asarray(system.masses), float(kbT()),
        jnp.asarray(md_coords[0, 0]), jnp.zeros((V, 3)), jax.random.PRNGKey(7),
        num_samples=args.chain_states, config=cfg,
        adaptive_parallelism=True, segment_iters=64, md_step_fn=md_step_fn,
    )
    mh_wall = time.perf_counter() - t0
    mh_states_per_s = len(chain_coords) / mh_wall
    print(
        f"MH chain: {len(chain_coords)} states, acceptance "
        f"{stats.acceptance_rate:.4f}, {mh_states_per_s:.0f} states/s wall "
        f"({len(stats)/mh_wall:.0f} proposals/s)",
        flush=True,
    )

    feats_mh = tica_features_full(chain_coords, topo)
    tics_mh = model_tica.transform(feats_mh)
    ess_mh0 = tic_ess(tics_mh, 0)
    ess_mh1 = tic_ess(tics_mh, 1)
    gap = tic_coverage_gap(tics_md_all, tics_mh)
    covered = gap < 0.3

    speedup0 = (ess_mh0 * mh_states_per_s) / (ess_md0 * md_frames_per_s)
    speedup1 = (ess_mh1 * mh_states_per_s) / (ess_md1 * md_frames_per_s)
    out = {
        "params": args.params,
        "recal": args.recal,
        "temperature": args.temperature,
        "md_steps": args.md_steps,
        "acceptance": stats.acceptance_rate,
        "chain_states": int(len(chain_coords)),
        "mh_states_per_s": mh_states_per_s,
        "mh_proposals_per_s": len(stats) / mh_wall,
        "md_frames_per_s_chain": md_frames_per_s,
        "ess_per_sample": {
            "mh_tic0": ess_mh0, "mh_tic1": ess_mh1,
            "md_tic0": ess_md0, "md_tic1": ess_md1,
        },
        "tic_coverage_gap": gap,
        "covered": bool(covered),
        "tic0_speedup_raw": speedup0,
        "tic1_speedup_raw": speedup1,
        # The notebook records 0 for chains that miss states.
        "tic0_speedup": speedup0 if covered else 0.0,
        "tic1_speedup": speedup1 if covered else 0.0,
    }
    print(json.dumps(out, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
