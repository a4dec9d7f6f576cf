"""Multi-protein (2AA-style) end-to-end training leg.

The reference's main training regime is many different short peptides per
batch, with per-protein energies batched by contiguous ``segments``
(reference: losses.py:58-98, datasets 2AA-*/4AA-*). This leg exercises the
TPU-native redesign end-to-end on built-from-sequence dipeptides:

1. Build N random dipeptides with the template builder + FIRE minimization.
2. Generate Langevin walkers per peptide (pure-JAX integrator, on device).
3. Train the flagship flow on MIXED batches (different molecules per batch)
   with NLL, then fine-tune with NLL+acceptance where per-row energies ride
   a stacked padded AmberSystem through the jitted step (physics/provider).
4. Run a short MH chain per peptide and report acceptance.

Usage: python tools/e2e_dipeptides.py [--quick]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.batch import MolDynDatapoint, collate_dense
from timewarp_tpu.data.peptide_builder import build_peptide, random_sequence
from timewarp_tpu.losses import LossConfig, make_loss
from timewarp_tpu.models.constructor import (
    CustomAttentionTransformerNVPConfig,
    ModelConfig,
    build_model,
)
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.physics.integrator import (
    maxwell_boltzmann_velocities,
    run_segment,
    sample_trajectory,
)
from timewarp_tpu.physics.losses import MixedEnergyModel
from timewarp_tpu.physics.minimize import minimize
from timewarp_tpu.physics.provider import stack_systems
from timewarp_tpu.sampling.mh import (
    MHConfig,
    make_amber_energy,
    make_flow_proposal,
    sample_with_model,
)
from timewarp_tpu.training.optim import OptimizerConfig, build_optimizer
from timewarp_tpu.training.train_step import TrainState, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--num-peptides", type=int, default=4)
    ap.add_argument("--walkers", type=int, default=16)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--train-steps", type=int, default=6000)
    ap.add_argument("--finetune-steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--mh-samples", type=int, default=3000)
    ap.add_argument("--save-params", default=None)
    args = ap.parse_args()
    if args.quick:
        args.num_peptides, args.walkers, args.frames = 2, 4, 40
        args.train_steps, args.finetune_steps, args.mh_samples = 60, 30, 60

    rng = np.random.default_rng(7)
    seqs = []
    while len(seqs) < args.num_peptides:
        s = random_sequence(2, rng)
        if s not in seqs:
            seqs.append(s)
    print("dipeptides:", seqs, flush=True)

    # --- 1+2. Build, minimize, simulate walkers per peptide ---
    mols = {}
    for seq in seqs:
        topo = build_peptide(seq)
        system, report = build_system(topo)
        assert not report.missing_dihedrals, (seq, report.missing_dihedrals)
        x0, e = jax.jit(lambda c: minimize(system, c, num_steps=2000))(
            jnp.asarray(topo.positions)
        )
        W = args.walkers
        keys = jax.random.split(jax.random.PRNGKey(hash(seq) % 2**31), W)
        v0 = jax.vmap(lambda k: maxwell_boltzmann_velocities(system, k))(keys)
        c0 = jnp.tile(x0[None], (W, 1, 1))
        burn = jax.jit(jax.vmap(lambda c, v, k: run_segment(system, c, v, k, num_steps=5000)))
        c, v = burn(c0, v0, jax.random.split(jax.random.PRNGKey(1), W))
        traj = jax.jit(
            jax.vmap(
                lambda c, v, k: sample_trajectory(
                    system, c, v, k, num_frames=args.frames, steps_per_frame=1000
                )
            )
        )
        tc, tv = traj(c, v, jax.random.split(jax.random.PRNGKey(2), W))
        tc, tv = np.asarray(tc), np.asarray(tv)
        assert np.isfinite(tc).all(), seq
        mols[seq] = dict(topo=topo, system=system, coords=tc, velocs=tv)
        print(f"  {seq}: {topo.num_atoms} atoms, {W}x{args.frames} frames", flush=True)

    v_pad = max(m["topo"].num_atoms for m in mols.values())
    v_pad = ((v_pad + 7) // 8) * 8

    def batches(batch_size):
        """Mixed-molecule minibatches + their stacked padded system."""
        names = list(mols)
        while True:
            pts, row_names = [], []
            for _ in range(batch_size):
                seq = names[rng.integers(len(names))]
                m = mols[seq]
                W, T = m["coords"].shape[:2]
                w, t = rng.integers(W), rng.integers(T - 1)
                z = np.zeros((m["topo"].num_atoms, 3), np.float32)
                pts.append(
                    MolDynDatapoint(
                        name=seq,
                        atom_types=m["topo"].atom_types,
                        adj_list=m["topo"].bonds.astype(np.int32),
                        atom_coords=m["coords"][w, t],
                        atom_velocs=m["velocs"][w, t],
                        atom_forces=z,
                        atom_coord_targets=m["coords"][w, t + 1],
                        atom_veloc_targets=m["velocs"][w, t + 1],
                        atom_force_targets=z,
                    )
                )
                row_names.append(seq)
            batch = collate_dense(pts, max_atoms=v_pad)
            stacked = stack_systems(
                [mols[n]["system"] for n in row_names], v_pad=batch.atom_coords.shape[1]
            )
            yield batch, stacked

    # --- 3. Train: NLL on mixed batches, then NLL+acceptance ---
    model = build_model(
        ModelConfig(
            model_type="custom_attention_transformer_nvp",
            custom_transformer_nvp_config=CustomAttentionTransformerNVPConfig(
                num_coupling_layers=4 if args.quick else 8,
                num_transformer_layers=1 if args.quick else 3,
                encoder_layer_config=CustomAttentionEncoderConfig(
                    d_model=32 if args.quick else 128,
                    dim_feedforward=64 if args.quick else 2048,
                    num_heads=6,
                    attention_type="kernel",
                ),
            ),
        )
    )
    gen = batches(args.batch_size)
    b0, _ = next(gen)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(3), b0.atom_types, b0.atom_coords, b0.atom_velocs,
        b0.atom_coord_targets, b0.atom_veloc_targets, b0.masked_elements,
    )

    def phase(params, cfg, steps, lr, tag, with_system):
        optimizer = build_optimizer(
            OptimizerConfig(learning_rate=lr, warmup_steps=min(500, steps // 4 + 1),
                            clip_grad_norm=1.0)
        )
        state = TrainState.create(params, optimizer)
        loss_fn = make_loss(cfg, energy_model=MixedEnergyModel() if with_system else None)
        step = make_train_step(model, loss_fn, optimizer, mesh=None, data_augmentation=True)
        t0 = time.time()
        for i in range(steps):
            batch, stacked = next(gen)
            if with_system:
                state, metrics = step(state, batch, jax.random.PRNGKey(10), stacked)
            else:
                state, metrics = step(state, batch, jax.random.PRNGKey(10))
            if i % 500 == 0 or i == steps - 1:
                print(
                    f"[{tag}] step {i:5d} loss {float(metrics['loss']):9.3f} "
                    f"({(time.time()-t0)/(i+1)*1000:.0f} ms/step)",
                    flush=True,
                )
        return state.params, float(metrics["loss"])

    params, nll = phase(
        params, LossConfig(name="nll", random_velocs=True),
        args.train_steps, 1e-4, "nll", with_system=False,
    )
    if args.finetune_steps:
        params, _ = phase(
            params,
            LossConfig(name="nll_acceptance", random_velocs=True, clamp=True,
                       high_energy_threshold=300.0, weights=(0.8, 0.2)),
            args.finetune_steps, 3e-5, "finetune", with_system=True,
        )
    if args.save_params:
        import pickle

        with open(args.save_params, "wb") as f:
            pickle.dump(jax.device_get(params), f)

    # --- 4. MH chain per peptide ---
    results = {"final_nll": nll, "acceptance": {}}
    for seq, m in mols.items():
        topo, system = m["topo"], m["system"]
        V = topo.num_atoms
        atom_types = jnp.asarray(np.pad(topo.atom_types, (0, v_pad - V)))[None]
        mask = jnp.asarray(np.arange(v_pad)[None] >= V)
        propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types, mask)
        energy_fn = make_amber_energy(system)

        def pad_unpad_propose(params, rng_, xc, xv, K, _p=propose_fn, _V=V):
            yc, yv, logp = _p(
                params, rng_,
                jnp.pad(xc, ((0, v_pad - _V), (0, 0))),
                jnp.pad(xv, ((0, v_pad - _V), (0, 0))), K,
            )
            return yc[:, :_V], yv[:, :_V], logp

        def pad_reverse(params, yc, yv, xc, xv, _r=reverse_logp_fn, _V=V):
            pad = ((0, 0), (0, v_pad - _V), (0, 0))
            return _r(params, jnp.pad(yc, pad), jnp.pad(yv, pad),
                      jnp.pad(xc, ((0, v_pad - _V), (0, 0))),
                      jnp.pad(xv, ((0, v_pad - _V), (0, 0))))

        coords, velocs, accepted, stats = sample_with_model(
            params, pad_unpad_propose, pad_reverse, energy_fn,
            jnp.asarray(system.masses), float(kbT()),
            jnp.asarray(m["coords"][0, 0]), jnp.zeros((V, 3)),
            jax.random.PRNGKey(11), num_samples=args.mh_samples,
            config=MHConfig(num_proposal_steps=16), adaptive_parallelism=True,
            segment_iters=16,
        )
        results["acceptance"][seq] = stats.acceptance_rate
        print(f"MH {seq}: acceptance {stats.acceptance_rate:.4f} "
              f"({stats.num_proposals} proposals)", flush=True)

    print("RESULT", results, flush=True)


if __name__ == "__main__":
    main()
