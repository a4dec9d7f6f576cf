"""End-to-end slice on alanine dipeptide, all on-device:

1. Generate an MD trajectory with the pure-JAX Langevin integrator
   (step_width=1000 @ 0.5fs, T=310K -- the AD-1 recipe,
   reference: configs/kernel_transformer_nvp.yaml + simulation/md.py).
2. Train the kernel-attention RealNVP on (x, y) pairs (random velocities).
3. Run the on-device MH chain with the trained proposal.
4. Report validation NLL, MH acceptance rate, and Ramachandran KL between
   the chain and the MD data.

Usage: python tools/e2e_alanine.py [--quick]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if "--f32" in sys.argv:
    # TPU matmuls default to bf16; the flow predicts ~5e-3 nm displacements
    # on ~1 nm coordinates, so full f32 accumulation is a candidate lever for
    # the NLL/proposal-quality gap (VERDICT round 2, items 2-3).
    jax.config.update("jax_default_matmul_precision", "float32")
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.batch import DenseBatch, lengths_to_mask
from timewarp_tpu.data.pdb import parse_pdb
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
from timewarp_tpu.sampling.mh import (
    MHConfig,
    make_amber_energy,
    make_flow_proposal,
    sample_with_model,
)
from timewarp_tpu.training.optim import OptimizerConfig, build_optimizer
from timewarp_tpu.training.train_step import TrainState, make_train_step
from timewarp_tpu.utils.torsions import ramachandran, ramachandran_kl

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def make_batches(coords, velocs, batch_size, rng, topo, V_pad=24):
    """Infinite shuffled minibatch iterator over trajectory pairs.

    coords/velocs: [W, T, V, 3] walker trajectories; pairs are consecutive
    frames within each walker.
    """
    x_c = coords[:, :-1].reshape(-1, *coords.shape[2:])
    y_c = coords[:, 1:].reshape(-1, *coords.shape[2:])
    x_v = velocs[:, :-1].reshape(-1, *velocs.shape[2:])
    y_v = velocs[:, 1:].reshape(-1, *velocs.shape[2:])
    N, V = x_c.shape[0], x_c.shape[1]
    atom_types = np.tile(topo.atom_types[None], (batch_size, 1))
    atom_types = np.pad(atom_types, ((0, 0), (0, V_pad - V)))
    mask = lengths_to_mask(np.full(batch_size, V), V_pad)

    def pad(a):
        return np.pad(a, ((0, 0), (0, V_pad - V), (0, 0)))

    while True:
        idx = rng.permutation(N)
        for s in range(0, N - batch_size + 1, batch_size):
            sel = idx[s : s + batch_size]
            zeros = np.zeros((batch_size, V_pad, 3), np.float32)
            yield DenseBatch(
                atom_types=jnp.asarray(atom_types),
                atom_coords=jnp.asarray(pad(x_c[sel])),
                atom_velocs=jnp.asarray(pad(x_v[sel])),
                atom_forces=jnp.asarray(zeros),
                atom_coord_targets=jnp.asarray(pad(y_c[sel])),
                atom_veloc_targets=jnp.asarray(pad(y_v[sel])),
                atom_force_targets=jnp.asarray(zeros),
                masked_elements=jnp.asarray(mask),
                adj_list=jnp.zeros((batch_size, 4, 2), jnp.int32),
                adj_mask=jnp.zeros((batch_size, 4), bool),
                names=tuple(["AD"] * batch_size),
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny run for smoke testing")
    ap.add_argument("--save-params", type=str, default=None)
    ap.add_argument("--load-params", type=str, default=None)
    ap.add_argument("--save-data", type=str, default=None)
    ap.add_argument("--load-data", type=str, default=None)
    ap.add_argument("--walkers", type=int, default=32)
    ap.add_argument("--frames", type=int, default=8000)
    ap.add_argument("--train-steps", type=int, default=3000)
    ap.add_argument("--finetune-steps", type=int, default=0,
                    help="acceptance-loss fine-tuning steps after NLL training")
    ap.add_argument("--finetune-weight", type=float, default=0.1)
    ap.add_argument("--finetune-loss", default="nll_acceptance",
                    choices=["nll_acceptance", "nll_energy", "nll_bonded"])
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--mh-samples", type=int, default=4000)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--ff", type=int, default=2048)
    ap.add_argument("--coupling", type=int, default=8)
    ap.add_argument("--enc-layers", type=int, default=3)
    ap.add_argument("--valid-walkers", type=int, default=0,
                    help="hold out this many whole walkers for validation NLL")
    ap.add_argument("--lr-decay", action="store_true",
                    help="cosine-decay the LR to lr/100 over each phase")
    ap.add_argument("--data-seed", type=int, default=0,
                    help="PRNG seed family for MD data generation")
    ap.add_argument("--f32", action="store_true",
                    help="force float32 matmul precision (TPU default is bf16)")
    ap.add_argument("--burn-in", type=int, default=20000,
                    help="Langevin burn-in steps per walker before sampling")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="if > 0, track an EMA of params (e.g. 0.999) and "
                         "report/keep the EMA weights when they validate better")
    args = ap.parse_args()
    if args.quick:
        args.frames, args.train_steps, args.mh_samples = 200, 50, 100
        args.d_model, args.ff, args.coupling, args.enc_layers = 16, 32, 2, 1

    topo = parse_pdb(AD_PDB)
    system, report = build_system(topo)
    V = topo.num_atoms
    print(f"AD: {V} atoms, charge {report.total_charge:+.3f}", flush=True)

    # --- 1. MD data generation: W independent walkers in one vmapped scan
    # (sequential Langevin steps are latency-bound at 22 atoms; walkers
    # amortize the dispatch and fill the VPU) ---
    if args.load_data:
        # Comma-separated NPZ list concatenates along the walker axis.
        cs, vs = [], []
        for path in args.load_data.split(","):
            z = np.load(path)
            cs.append(z["coords"])
            vs.append(z["velocs"])
        traj_coords = np.concatenate(cs, axis=0)
        traj_velocs = np.concatenate(vs, axis=0)
        print(f"loaded data {traj_coords.shape}", flush=True)
        return run_train_and_mh(args, topo, system, traj_coords, traj_velocs)
    t0 = time.time()
    W = args.walkers
    frames_per_walker = max(args.frames // W, 2)
    keys = jax.random.split(jax.random.PRNGKey(args.data_seed), W)
    coords0 = jnp.tile(jnp.asarray(topo.positions)[None], (W, 1, 1))
    velocs0 = jax.vmap(lambda k: maxwell_boltzmann_velocities(system, k))(keys)

    # Chunk every device program to <= ~500k sequential Langevin steps: one
    # multi-million-step lax.scan program exceeds the axon tunnel's
    # execution watchdog and crashes the TPU worker (observed twice at
    # 2.5M steps/program).
    coords, velocs = coords0, velocs0
    burn_chunks = []
    remaining = max(args.burn_in, 1)
    while remaining > 0:
        burn_chunks.append(min(remaining, 100_000))
        remaining -= burn_chunks[-1]
    burn_fns = {
        n: jax.jit(
            jax.vmap(lambda c, v, k, n=n: run_segment(system, c, v, k, num_steps=n))
        )
        for n in set(burn_chunks)
    }
    for r, n in enumerate(burn_chunks):
        coords, velocs = burn_fns[n](
            coords, velocs,
            jax.random.split(jax.random.PRNGKey(args.data_seed + 1 + r), W),
        )
    frames_per_chunk = 500
    traj = jax.jit(
        jax.vmap(
            lambda c, v, k: sample_trajectory(
                system, c, v, k, num_frames=frames_per_chunk, steps_per_frame=1000
            )
        )
    )
    tc_parts, tv_parts = [], []
    done = 0
    ci = 0
    while done < frames_per_walker:
        tc, tv = traj(
            coords, velocs,
            jax.random.split(jax.random.PRNGKey(args.data_seed + 1000 + ci), W),
        )
        coords, velocs = tc[:, -1], tv[:, -1]
        take = min(frames_per_chunk, frames_per_walker - done)
        tc_parts.append(np.asarray(tc[:, :take]))
        tv_parts.append(np.asarray(tv[:, :take]))
        done += take
        ci += 1
    # [W, T, V, 3]; pairs are consecutive frames WITHIN a walker.
    traj_coords = np.concatenate(tc_parts, axis=1)
    traj_velocs = np.concatenate(tv_parts, axis=1)
    assert np.isfinite(traj_coords).all()
    total_steps = W * (args.burn_in + frames_per_walker * 1000)
    print(
        f"MD: {W} walkers x {frames_per_walker} frames x 1000 steps in "
        f"{time.time()-t0:.1f}s ({total_steps/(time.time()-t0):.0f} steps/s)",
        flush=True,
    )
    if args.save_data:
        np.savez_compressed(args.save_data, coords=traj_coords, velocs=traj_velocs)
        print(f"saved data -> {args.save_data}", flush=True)
    run_train_and_mh(args, topo, system, traj_coords, traj_velocs)


def run_train_and_mh(args, topo, system, traj_coords, traj_velocs):
    import pickle

    V = topo.num_atoms
    # Held-out validation split by WHOLE walkers (the reference protocol
    # holds out trajectories, not frames; valid NLL anchor: -6.56 on AD-1,
    # reference: configs/kernel_transformer_nvp.yaml:1-3).
    valid_coords = valid_velocs = None
    if args.valid_walkers > 0:
        valid_coords = traj_coords[: args.valid_walkers]
        valid_velocs = traj_velocs[: args.valid_walkers]
        traj_coords = traj_coords[args.valid_walkers :]
        traj_velocs = traj_velocs[args.valid_walkers :]
        print(f"split: {traj_coords.shape[0]} train / {valid_coords.shape[0]} valid walkers", flush=True)
    # --- 2. Training ---
    model = build_model(
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
    nprng = np.random.default_rng(0)
    batches = make_batches(traj_coords, traj_velocs, 32, nprng, topo)
    batch0 = next(batches)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(3),
        batch0.atom_types,
        batch0.atom_coords,
        batch0.atom_velocs,
        batch0.atom_coord_targets,
        batch0.atom_veloc_targets,
        batch0.masked_elements,
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.1f}M params", flush=True)

    if args.load_params:
        with open(args.load_params, "rb") as f:
            params = jax.device_put(pickle.load(f))
        print(f"loaded params <- {args.load_params}", flush=True)
    losses = [float("nan")]

    batches = make_batches(traj_coords, traj_velocs, args.batch_size, nprng, topo)

    valid_nll_fn = None
    if valid_coords is not None:
        from timewarp_tpu.training.train_step import make_eval_step

        vrng = np.random.default_rng(99)
        nll_loss = make_loss(LossConfig(name="nll", random_velocs=True))
        eval_step = make_eval_step(model, nll_loss)

        # A fixed deterministic valid set: one pass of batches.
        v_batches = []
        vb = make_batches(valid_coords, valid_velocs, args.batch_size, vrng, topo)
        n_valid = valid_coords.shape[0] * (valid_coords.shape[1] - 1)
        for _ in range(max(n_valid // args.batch_size, 1)):
            v_batches.append(next(vb))

        def valid_nll_fn(params):
            tot = 0.0
            for j, b in enumerate(v_batches):
                m = eval_step(params, b, jax.random.PRNGKey(1000 + j))
                tot += float(m["loss"])
            return tot / len(v_batches)

    def train_phase(params, loss_cfg, steps, lr, tag, energy_model=None):
        optimizer = build_optimizer(
            OptimizerConfig(learning_rate=lr, warmup_steps=min(1000, steps // 4 + 1),
                            clip_grad_norm=1.0,
                            decay_steps=steps if args.lr_decay else None)
        )
        state = TrainState.create(params, optimizer)
        loss_fn = make_loss(loss_cfg, energy_model=energy_model)
        step = make_train_step(model, loss_fn, optimizer, mesh=None, data_augmentation=True)
        # Copy: the original params buffers are donated into the first
        # jitted step (donate_argnums) and deleted; an aliased EMA seed
        # crashes with "Array has been deleted".
        ema = jax.tree.map(jnp.copy, params) if args.ema > 0 else None
        if ema is not None:
            d = args.ema
            ema_fn = jax.jit(
                lambda e, p: jax.tree.map(lambda a, b: d * a + (1 - d) * b, e, p)
            )
        t0 = time.time()
        last = float("nan")
        for i in range(steps):
            state, metrics = step(state, next(batches), jax.random.PRNGKey(10))
            if ema is not None:
                ema = ema_fn(ema, state.params)
            if i > 0 and i % 10000 == 0:
                checkpoint(state.params, f"{tag}-step{i}")
            if i % 500 == 0 or i == steps - 1:
                last = float(metrics["loss"])
                extra = ""
                if "mh_acceptance_estimate" in metrics:
                    extra = f" acc~{float(metrics['mh_acceptance_estimate']):.4f}"
                if valid_nll_fn is not None and (i % 5000 == 0 or i == steps - 1):
                    extra += f" valid_nll {valid_nll_fn(state.params):8.3f}"
                    if ema is not None:
                        extra += f" ema_valid {valid_nll_fn(ema):8.3f}"
                print(
                    f"[{tag}] step {i:6d} loss {last:9.3f}{extra} "
                    f"({(time.time()-t0)/(i+1)*1000:.0f} ms/step)",
                    flush=True,
                )
        if ema is not None and valid_nll_fn is not None:
            v_raw, v_ema = valid_nll_fn(state.params), valid_nll_fn(ema)
            print(f"[{tag}] final valid: raw {v_raw:.3f} ema {v_ema:.3f}", flush=True)
            if v_ema < v_raw:
                return ema, last
        return state.params, last

    def checkpoint(params, tag):
        if args.save_params:
            with open(args.save_params, "wb") as f:
                pickle.dump(jax.device_get(params), f)
            print(f"saved params ({tag}) -> {args.save_params}", flush=True)
            if tag.startswith("post-"):
                # Keep phase-boundary checkpoints (e.g. the pure-NLL model
                # before an acceptance/bonded finetune overwrites the path).
                side = args.save_params.replace(".pkl", f".{tag}.pkl")
                with open(side, "wb") as f:
                    pickle.dump(jax.device_get(params), f)

    if args.train_steps > 0:
        params, nll = train_phase(
            params, LossConfig(name="nll", random_velocs=True),
            args.train_steps, args.lr, "nll",
        )
        losses = [nll]
        checkpoint(params, "post-nll")
    if args.finetune_steps > 0:
        from timewarp_tpu.physics.losses import EnergyModel

        em = EnergyModel(system=system)
        cfg = LossConfig(
            name=args.finetune_loss, random_velocs=True, clamp=True,
            high_energy_threshold=300.0,
            weights=(1.0 - args.finetune_weight, args.finetune_weight),
        )
        params, ft = train_phase(
            params, cfg, args.finetune_steps, args.lr * 0.3, "finetune", energy_model=em
        )
    if args.save_params:
        with open(args.save_params, "wb") as f:
            pickle.dump(jax.device_get(params), f)
        print(f"saved params -> {args.save_params}", flush=True)

    # --- 3. MH sampling ---
    if args.mh_samples <= 0:
        print("RESULT", {"final_nll": losses[-1]}, flush=True)
        return
    atom_types1 = jnp.asarray(np.pad(topo.atom_types[None], ((0, 0), (0, 0))))
    mask1 = jnp.zeros((1, V), bool)
    propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types1, mask1)
    energy_fn = make_amber_energy(system)
    t0 = time.time()
    chain_coords, chain_velocs, accepted, stats = sample_with_model(
        params,
        propose_fn,
        reverse_logp_fn,
        energy_fn,
        jnp.asarray(system.masses),
        float(kbT()),
        jnp.asarray(traj_coords[0, 0]),
        jnp.zeros((V, 3)),
        jax.random.PRNGKey(42),
        num_samples=args.mh_samples,
        config=MHConfig(num_proposal_steps=16),
        adaptive_parallelism=True,
        segment_iters=32,
    )
    dt = time.time() - t0
    print(
        f"MH: {len(stats)} proposals, acceptance {stats.acceptance_rate:.3f}, "
        f"{len(stats)/dt:.0f} proposals/s (wall, incl. host bookkeeping)",
        flush=True,
    )

    # --- 4. Ramachandran parity ---
    phi_md, psi_md = ramachandran(jnp.asarray(traj_coords), topo)
    phi_mh, psi_mh = ramachandran(jnp.asarray(chain_coords), topo)
    kl = ramachandran_kl(phi_md, psi_md, phi_mh, psi_mh, bins=18)
    print(f"Ramachandran sym-KL (MD vs MH chain): {kl:.3f}", flush=True)
    print(
        "RESULT",
        {
            "final_nll": losses[-1],
            "acceptance": stats.acceptance_rate,
            "rama_kl": kl,
        },
        flush=True,
    )


if __name__ == "__main__":
    main()
