"""Evaluation CLI: MH sampling + diagnostics for a trained model.

Usage:
  python -m timewarp_tpu.cli.evaluate <params.pkl> <state0.pdb> \
      [--mh] [--num-samples N] [--num-proposal-steps K] [--adaptive] \
      [--output-dir DIR] [--config config.yaml]

The reference's evaluate.py (reference: evaluate.py:102-871) per-protein
loop: conditional diagnostics on data states, the MH chain, acceptance
aggregation, kinetic-energy KS test, Ramachandran comparison. Plots are
written when matplotlib is available.
"""
import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("params", help="pickled params or orbax checkpoint dir")
    ap.add_argument("state0_pdb")
    ap.add_argument("--config", default=None, help="training config yaml (model arch)")
    ap.add_argument("--mh", action="store_true", help="run the MH chain")
    ap.add_argument("--data-npz", default=None, help="MD arrays npz for parity checks")
    ap.add_argument("--num-samples", type=int, default=10_000)
    ap.add_argument("--num-proposal-steps", type=int, default=16)
    ap.add_argument("--adaptive", action="store_true")
    # MH feature flags matching the reference chain options
    # (reference: utils/evaluation_utils.py:558-626, :604-607).
    ap.add_argument("--rotate", action="store_true",
                    help="random rotation of the current state each MH step")
    ap.add_argument("--md-steps-current", type=int, default=0,
                    help="interleaved Langevin steps on the current state")
    ap.add_argument("--md-steps-proposal", type=int, default=0,
                    help="interleaved Langevin steps on each proposal")
    ap.add_argument("--output-dir", default="outputs/evaluation")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from timewarp_tpu.config import load_config
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.models.constructor import ModelConfig, build_model
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.constants import kbT
    from timewarp_tpu.sampling.evaluation import kinetic_energy_ks
    from timewarp_tpu.sampling.mh import (
        MHConfig,
        make_amber_energy,
        make_flow_proposal,
        sample_with_model,
    )
    from timewarp_tpu.utils.chirality import chirality_signs, find_chirality_centers
    from timewarp_tpu.utils.torsions import ramachandran, ramachandran_kl

    os.makedirs(args.output_dir, exist_ok=True)

    topo = parse_pdb(args.state0_pdb)
    system, _ = build_system(topo)
    V = topo.num_atoms

    if args.config:
        model_config = load_config(args.config).model_config
    else:
        model_config = ModelConfig()  # flagship default
    model = build_model(model_config)

    from timewarp_tpu.utils.params_io import load_params

    params = load_params(args.params)

    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types, mask)
    energy_fn = make_amber_energy(system)

    summary = {"num_atoms": V}

    if args.mh:
        import time

        from timewarp_tpu.sampling.mh import make_md_step_fn

        centers = find_chirality_centers(topo.bonds, V, atom_types=topo.atom_types)
        ref_signs = chirality_signs(jnp.asarray(topo.positions), centers)
        interleave_md = args.md_steps_current > 0 or args.md_steps_proposal > 0
        t0 = time.perf_counter()
        coords, velocs, accepted, stats = sample_with_model(
            params,
            propose_fn,
            reverse_logp_fn,
            energy_fn,
            jnp.asarray(system.masses),
            float(kbT()),
            jnp.asarray(topo.positions),
            jnp.zeros((V, 3)),
            jax.random.PRNGKey(0),
            num_samples=args.num_samples,
            config=MHConfig(
                num_proposal_steps=args.num_proposal_steps,
                rotate=args.rotate,
                md_steps_current=args.md_steps_current,
                md_steps_proposal=args.md_steps_proposal,
            ),
            adaptive_parallelism=args.adaptive,
            chirality_centers=jnp.asarray(centers) if len(centers) else None,
            reference_signs=ref_signs if len(centers) else None,
            md_step_fn=make_md_step_fn(system) if interleave_md else None,
        )
        wall = time.perf_counter() - t0
        stats.save(os.path.join(args.output_dir, "chain_stats.pkl"))
        np.savez_compressed(
            os.path.join(args.output_dir, "chain.npz"), coords=coords, velocs=velocs
        )
        summary["acceptance_rate"] = stats.acceptance_rate
        summary["num_accepted"] = accepted
        summary["chain_length"] = len(coords)
        summary["mh_wall_s"] = wall
        summary["proposals_per_s_wall"] = float(stats.num_proposals) / wall
        summary["proposals_per_s_steady"] = stats.steady_proposals_per_s
        print(
            f"MH: {stats.num_proposals} proposals in {wall:.1f}s "
            f"-> {stats.num_proposals / wall:,.0f} proposals/s (wall, incl. host "
            f"and one-time compile), {stats.steady_proposals_per_s:,.0f}/s steady-state"
        )

        if args.data_npz:
            md = np.load(args.data_npz)
            # Accept both the simulate-CLI reporter schema (positions/
            # velocities) and the walker-trajectory schema (coords/velocs).
            md_pos = md["positions" if "positions" in md else "coords"].reshape(-1, V, 3)
            phi_md, psi_md = ramachandran(jnp.asarray(md_pos), topo)
            phi_mh, psi_mh = ramachandran(jnp.asarray(coords), topo)
            summary["ramachandran_kl"] = ramachandran_kl(phi_md, psi_md, phi_mh, psi_mh)
            md_vel = md["velocities"] if "velocities" in md else md["velocs"]
            summary["kinetic_ks_md"] = kinetic_energy_ks(
                md_vel.reshape(-1, V, 3), np.asarray(system.masses), float(kbT())
            )

    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
