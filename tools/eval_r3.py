"""Round-3 product evaluation: flow-only mixing + honest controls.

Measures, on one chip, with the flagship AD checkpoint:

1. **flow_only**: W-walker ensemble MH with md_steps = 0 and SINGLE-state
   initialization (every walker starts from the same dataset state -- the
   reference explorer protocol, exploration.py:209,225-232). Reports
   acceptance, proposals/s wall, and symmetric Ramachandran KL vs the MD
   ensemble. This is the VERDICT round-2 #2 target (KL < 2, acc >= 5%,
   >= 10k proposals/s, md_steps = 0).
2. **md_interleaved** (optional, --md-steps > 0): the round-2 headline
   configuration (basin-spread init + interleaved MD), kept comparable.
3. **reject_all control** (with --md-steps > 0): identical init and MD
   interleaves but every proposal rejected -- quantifies how much KL the
   initialization + MD alone buy with the flow contributing nothing
   (ADVICE round 2, item 1).

Usage:
  python tools/eval_r3.py runs/adB_product.pkl runs/ad_data5.npz \
      --proposals 2000000 --out runs/report_r3
"""
import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.models.constructor import (
    CustomAttentionTransformerNVPConfig,
    ModelConfig,
    build_model,
)
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.sampling.ensemble import (
    histogram_kl,
    ramachandran_histogram,
    sample_ensemble,
)
from timewarp_tpu.sampling.mh import (
    MHConfig,
    make_amber_energy,
    make_flow_proposal,
    make_md_step_fn,
)

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def build_ad_model(args):
    return build_model(
        ModelConfig(
            model_type="custom_attention_transformer_nvp",
            custom_transformer_nvp_config=CustomAttentionTransformerNVPConfig(
                atom_embedding_dim=32,
                latent_mlp_hidden_dims=(256,),
                num_coupling_layers=args.coupling,
                num_transformer_layers=args.enc_layers,
                encoder_layer_config=CustomAttentionEncoderConfig(
                    d_model=args.d_model,
                    dim_feedforward=args.ff,
                    num_heads=6,
                    attention_type="kernel",
                    lengthscales=(0.1, 0.2, 0.5, 0.7, 1.0, 1.2),
                ),
            ),
        )
    )


def run_ensemble(tag, params, fns, system, topo, init, args, md_hist,
                 md_steps=0, reject_all=False, spread_init=False,
                 proposals=None):
    propose_fn, reverse_logp_fn, energy_fn = fns
    cfg = MHConfig(
        num_proposal_steps=args.k,
        max_num_proposal_steps=args.max_k,
        md_steps_current=md_steps,
        md_steps_proposal=md_steps,
        reject_all=reject_all,
    )
    md_step_fn = make_md_step_fn(system) if md_steps > 0 else None
    t0 = time.time()
    res = sample_ensemble(
        params, propose_fn, reverse_logp_fn, energy_fn,
        jnp.asarray(system.masses), float(kbT()), init,
        jax.random.PRNGKey(args.seed), topo,
        num_proposals=proposals or args.proposals,
        config=cfg, bins=18, segment_iters=args.segment_iters,
        adaptive_parallelism=not reject_all,
        md_step_fn=md_step_fn, log_every=args.log_every,
    )
    dt = time.time() - t0
    kl = histogram_kl(res.hist, md_hist)
    # Co-quoted chain-quality stat (VERDICT round 3, weak #2): uncentered
    # energy-histogram overlap of chain snapshots vs the MD ensemble --
    # same potential, so proposal heat shows up as low overlap.
    from timewarp_tpu.physics.energy import batched_potential_energy
    from timewarp_tpu.sampling.evaluation import energy_histogram_overlap

    snap = res.snapshots[len(res.snapshots) // 2:].reshape(-1, init.shape[1], 3)
    e_chain = np.asarray(
        batched_potential_energy(system, jnp.asarray(snap[:2000]))
    ) / float(kbT())
    out = {
        "tag": tag,
        "init": "spread" if spread_init else "single-state",
        "md_steps": md_steps,
        "reject_all": reject_all,
        "temperature": args.temperature,
        "walkers": int(init.shape[0]),
        "proposals": res.num_proposals,
        "acceptance": res.acceptance_rate,
        "proposals_per_sec_wall": res.num_proposals / dt,
        "rama_sym_kl": kl,
        "energy_overlap_vs_md": None,  # filled below
        "K_trace_head": list(res.K_trace[:12]),
        "K_final": res.K_trace[-1] if res.K_trace else None,
        "wall_s": dt,
    }
    out["energy_overlap_vs_md"] = energy_histogram_overlap(
        args._e_md, e_chain, bins=40
    )
    print(f"[{tag}] KL {kl:.2f} acc {res.acceptance_rate:.4f} "
          f"{out['proposals_per_sec_wall']:.0f} prop/s "
          f"({res.num_proposals} proposals, {dt:.0f}s)", flush=True)
    return out, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("params")
    ap.add_argument("data")
    ap.add_argument("--walkers", type=int, default=64)
    ap.add_argument("--proposals", type=int, default=2_000_000)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--max-k", type=int, default=64)
    ap.add_argument("--segment-iters", type=int, default=128)
    ap.add_argument("--md-steps", type=int, default=0,
                    help="also run the MD-interleaved variant + its control")
    ap.add_argument("--md-proposals", type=int, default=0,
                    help="proposals for the MD-interleaved runs (default: proposals/4)")
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--ff", type=int, default=2048)
    ap.add_argument("--coupling", type=int, default=8)
    ap.add_argument("--enc-layers", type=int, default=3)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--log-every", type=int, default=8)
    ap.add_argument("--out", default="runs/report_r3")
    ap.add_argument("--temperature", type=float, default=1.0,
                    help="proposal temperature (exactly tempered MH; "
                         "flow.conditional_sample_with_logp)")
    ap.add_argument("--veloc-temperature", type=float, default=None)
    ap.add_argument("--recal", type=str, default=None,
                    help="fitted internal-coordinate recalibration pickle "
                         "(tools/fit_recalibration.py)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    V = topo.num_atoms
    md = np.load(args.data)
    md_flat = md["coords"].reshape(-1, V, 3)
    md_hist = ramachandran_histogram(md_flat[::4], topo, bins=18)
    from timewarp_tpu.physics.energy import batched_potential_energy

    args._e_md = np.asarray(
        batched_potential_energy(system, jnp.asarray(md_flat[:: max(len(md_flat) // 2000, 1)][:2000]))
    ) / float(kbT())

    model = build_ad_model(args)
    with open(args.params, "rb") as f:
        params = jax.device_put(pickle.load(f))
    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    recal = None
    if args.recal:
        from timewarp_tpu.models.recalibration import load_recalibration

        recal = load_recalibration(args.recal)
    fns = (
        *make_flow_proposal(
            model, atom_types, mask,
            temperature=args.temperature,
            veloc_temperature=args.veloc_temperature,
            recalibration=recal,
        ),
        make_amber_energy(system),
    )

    W = args.walkers
    single_init = jnp.tile(jnp.asarray(md_flat[0])[None], (W, 1, 1))
    stride = max(md_flat.shape[0] // W, 1)
    spread_init = jnp.asarray(md_flat[::stride][:W])

    os.makedirs(args.out, exist_ok=True)
    results = {"checkpoint": args.params, "data": args.data, "recal": args.recal}

    # 1. The target: flow-only, single-state init.
    results["flow_only"], res_fo = run_ensemble(
        "flow_only", params, fns, system, topo, single_init, args, md_hist
    )
    np.save(os.path.join(args.out, "hist_flow_only.npy"), res_fo.hist)

    if args.md_steps > 0:
        mdp = args.md_proposals or args.proposals // 4
        # 2. Round-2 headline configuration (spread init + interleaved MD).
        results["md_interleaved"], _ = run_ensemble(
            "md_interleaved", params, fns, system, topo, spread_init, args,
            md_hist, md_steps=args.md_steps, spread_init=True, proposals=mdp,
        )
        # 3. Its control: same init + MD, flow rejected everywhere.
        results["control_reject_all"], _ = run_ensemble(
            "control_reject_all", params, fns, system, topo, spread_init,
            args, md_hist, md_steps=args.md_steps, reject_all=True,
            spread_init=True, proposals=mdp,
        )

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    print("RESULT", json.dumps({k: v for k, v in results.items()
                                if isinstance(v, dict)}, default=float),
          flush=True)


if __name__ == "__main__":
    main()
