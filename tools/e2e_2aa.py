"""The transferable 2AA regime end-to-end (VERDICT round 3, next-steps #2/#6).

Mirrors the reference's main product: a conditional flow trained on MANY
different dipeptides that transfers to held-out peptides
(reference: utils/dataset_utils.py:199-206 -- 2AA-* datasets of ~1,500
trajectory files; configs/kernel_cheb_transformer_nvp.yaml,
local_transformer_nvp.yaml).

Pipeline:
1. Build ``--train-peptides`` + ``--holdout-peptides`` unique random
   dipeptides (template builder + FIRE minimization), simulate Langevin
   walkers per peptide on device under the ``--preset`` force-field preset
   (default amber14-implicit -- the preset the reference maps every 2AA/4AA
   dataset to, simulation/md.py get_preset_from_dataset; see
   physics/presets.py for the disclosed ff14SB-torsion gap), and write
   standard per-peptide ``{seq}-traj-state0.pdb`` / ``{seq}-traj-arrays.npz``
   pairs into ``--data-dir/train`` or ``--data-dir/val`` -- the split lives
   ON DISK so ``cli.train dataset=2AA-JAX split=train`` can never touch the
   holdout peptides (VERDICT round 3, weak #8). Resumable: existing pairs
   are reused (the reference's preprocessor skips ingested PDBs the same
   way, preprocess_lmdb.py:54-100).
2. Train a kernel_cheb/local/kernel transformer NVP on mixed-molecule
   batches drawn ONLY from the train split, with SIZE-BUCKETED collation:
   each batch is drawn from one padded-size bucket, so a 22-atom dipeptide
   batch does not pay a 56-atom attention pad (round-3 ran everything at
   the global V_pad and measured 13x below the AD throughput).
3. Evaluate adaptive-K ensemble MH on each HELD-OUT dipeptide at its OWN
   padded size: acceptance + symmetric Ramachandran KL of the chain vs
   that peptide's own MD data.

Usage:
  python tools/e2e_2aa.py --train-peptides 100 --holdout-peptides 6 \
      --attention chebyshev_kernel --train-steps 150000 --lr-decay \
      --save-params runs/params_2aa14.pkl --report runs/report_2aa14.json
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
    # The TPU tunnel is single-client; smokes must not contend with a
    # training/datagen process holding it.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.batch import MolDynDatapoint, collate_dense
from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.data.peptide_builder import build_peptide, random_sequence
from timewarp_tpu.data.trajectory import load_trajectory_pairs
from timewarp_tpu.losses import LossConfig, make_loss
from timewarp_tpu.models.constructor import (
    CustomAttentionTransformerNVPConfig,
    ModelConfig,
    build_model,
)
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.physics.integrator import (
    maxwell_boltzmann_velocities,
    run_segment,
    sample_trajectory,
)
from timewarp_tpu.physics.losses import MixedEnergyModel
from timewarp_tpu.physics.minimize import minimize
from timewarp_tpu.physics.presets import build_system_from_preset, langevin_config
from timewarp_tpu.physics.provider import stack_systems
from timewarp_tpu.sampling.ensemble import (
    histogram_kl,
    paired_phi_psi_indices,
    ramachandran_histogram,
    sample_ensemble,
)
from timewarp_tpu.sampling.mh import MHConfig, make_amber_energy, make_flow_proposal
from timewarp_tpu.training.optim import OptimizerConfig, build_optimizer
from timewarp_tpu.training.train_step import TrainState, make_train_step
from timewarp_tpu.utils.structure_io import write_pdb


def encoder_config(attention, d_model, ff):
    enc = dict(d_model=d_model, dim_feedforward=ff, num_heads=6,
               attention_type=attention)
    if attention == "chebyshev_kernel":
        # reference: configs/kernel_cheb_transformer_nvp.yaml (one
        # lengthscale per head, Chebyshev expansion of exp(-x)).
        enc.update(cheb_order=16, force_asymptotic_zero=True,
                   lengthscales=(0.1, 0.2, 0.5, 0.7, 1.0, 1.2))
    elif attention == "local":
        # reference: configs/local_transformer_nvp.yaml
        enc.update(max_radius=0.6, max_neighbors=30, lengthscales=None)
    else:
        enc.update(lengthscales=(0.1, 0.2, 0.5, 0.7, 1.0, 1.2))
    return CustomAttentionEncoderConfig(**enc)


def generate_peptide(seq, split_dir, walkers, frames, burn_in, seed, preset):
    """Simulate one peptide under ``preset`` and write the standard file
    pair into the split directory. Resumable."""
    state0 = os.path.join(split_dir, f"{seq}-traj-state0.pdb")
    arrays = os.path.join(split_dir, f"{seq}-traj-arrays.npz")
    if os.path.exists(state0) and os.path.exists(arrays):
        return False
    topo = build_peptide(seq)
    system, report = build_system_from_preset(topo, preset)
    if report.missing_dihedrals:
        raise ValueError(f"{seq}: missing dihedrals {report.missing_dihedrals}")
    cfg = langevin_config(preset)
    x0, _ = jax.jit(lambda c: minimize(system, c, num_steps=2000))(
        jnp.asarray(topo.positions)
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), walkers)
    v0 = jax.vmap(
        lambda k: maxwell_boltzmann_velocities(system, k, cfg.temperature)
    )(keys)
    c0 = jnp.tile(x0[None], (walkers, 1, 1))
    burn = jax.jit(
        jax.vmap(
            lambda c, v, k: run_segment(system, c, v, k, num_steps=burn_in, config=cfg)
        )
    )
    c, v = burn(c0, v0, jax.random.split(jax.random.PRNGKey(seed + 1), walkers))
    traj = jax.jit(
        jax.vmap(
            lambda c, v, k: sample_trajectory(
                system, c, v, k, num_frames=frames, steps_per_frame=1000, config=cfg
            )
        )
    )
    tc, tv = traj(c, v, jax.random.split(jax.random.PRNGKey(seed + 2), walkers))
    tc = np.asarray(tc)
    tv = np.asarray(tv)
    assert np.isfinite(tc).all(), seq
    # One NPZ with all walkers concatenated along a fake "step" axis spaced
    # far apart (1e9 between walkers) so in-walker pairs at step_width=1000
    # exist and cross-walker pairs cannot (cli.simulate writes one file per
    # walker instead; a single file per peptide mirrors the reference's 2AA
    # layout of one trajectory per file).
    T = frames
    steps = np.concatenate(
        [w * 10**9 + np.arange(T) * 1000 for w in range(walkers)]
    )
    flat = lambda a: a.reshape(walkers * T, *a.shape[2:])
    write_pdb(state0, topo, np.asarray(x0))
    np.savez_compressed(
        arrays,
        step=steps,
        time=steps * cfg.timestep,
        positions=flat(tc),
        velocities=flat(tv),
        forces=np.zeros_like(flat(tc)),
        energies=np.zeros((walkers * T, 2), np.float32),
    )
    return True


def load_peptide(seq, split_dir):
    state0 = os.path.join(split_dir, f"{seq}-traj-state0.pdb")
    arrays = os.path.join(split_dir, f"{seq}-traj-arrays.npz")
    topo = parse_pdb(state0)
    td = load_trajectory_pairs(seq, state0, arrays, step_width=1000,
                               equal_data_spacing=False, topology=topo)
    return topo, td


def pad8(v: int) -> int:
    return ((v + 7) // 8) * 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-peptides", type=int, default=50)
    ap.add_argument("--aa-length", type=int, default=2,
                    help="residues per peptide (2 = 2AA regime, 4 = 4AA)")
    ap.add_argument("--holdout-peptides", type=int, default=5)
    ap.add_argument("--walkers", type=int, default=8)
    ap.add_argument("--frames", type=int, default=251)
    ap.add_argument("--burn-in", type=int, default=50000)
    ap.add_argument("--data-dir", default="runs/data_2aa14")
    ap.add_argument("--preset", default="amber14-implicit",
                    help="force-field preset for datagen + energies "
                         "(the reference maps 2AA/4AA to amber14-implicit)")
    ap.add_argument("--attention", default="chebyshev_kernel",
                    choices=["kernel", "chebyshev_kernel", "local"])
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--ff", type=int, default=2048)
    ap.add_argument("--coupling", type=int, default=8)
    ap.add_argument("--enc-layers", type=int, default=3)
    ap.add_argument("--train-steps", type=int, default=100000)
    ap.add_argument("--finetune-steps", type=int, default=0)
    ap.add_argument("--finetune-loss", default="nll_acceptance")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr-decay", action="store_true")
    ap.add_argument("--ema", type=float, default=0.0)
    ap.add_argument("--mh-proposals", type=int, default=200000,
                    help="MH proposals per held-out peptide")
    ap.add_argument("--eval-walkers", type=int, default=16)
    ap.add_argument("--eval-segment-iters", type=int, default=128)
    ap.add_argument("--eval-max-k", type=int, default=64)
    ap.add_argument("--eval-temperature", type=float, default=1.0)
    ap.add_argument("--save-params", default=None)
    ap.add_argument("--load-params", default=None)
    ap.add_argument("--report", default=None)
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--no-holdout-recal", dest="holdout_recal",
                    action="store_false", default=True,
                    help="disable per-peptide self-calibrated proposal "
                         "recalibration in the held-out eval")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training (use with --load-params)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (TPU tunnel is single-client)")
    args = ap.parse_args()
    if args.quick:
        args.train_peptides, args.holdout_peptides = 3, 1
        args.walkers, args.frames, args.burn_in = 2, 20, 500
        args.train_steps, args.mh_proposals = 50, 2000
        args.d_model, args.ff, args.coupling, args.enc_layers = 16, 32, 2, 1
        args.eval_walkers = 4

    train_dir = os.path.join(args.data_dir, "train")
    val_dir = os.path.join(args.data_dir, "val")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    seqs = []
    while len(seqs) < args.train_peptides + args.holdout_peptides:
        s = random_sequence(args.aa_length, rng)
        if s not in seqs:
            try:
                build_peptide(s)
            except Exception:
                continue
            seqs.append(s)
    train_seqs = seqs[: args.train_peptides]
    holdout_seqs = seqs[args.train_peptides :]
    print(f"preset: {args.preset}", flush=True)
    print(f"train peptides ({len(train_seqs)}): {train_seqs}", flush=True)
    print(f"holdout peptides ({len(holdout_seqs)}): {holdout_seqs}", flush=True)

    # --- 1. Data generation (resumable, split on disk) ---
    t0 = time.time()
    for i, seq in enumerate(seqs):
        split_dir = train_dir if seq in train_seqs else val_dir
        fresh = generate_peptide(
            seq, split_dir, args.walkers, args.frames, args.burn_in,
            seed=args.seed * 1000 + i * 17, preset=args.preset,
        )
        if fresh:
            print(f"  [{i+1}/{len(seqs)}] {seq} simulated "
                  f"({time.time()-t0:.0f}s elapsed)", flush=True)
    print(f"data generation done in {time.time()-t0:.0f}s", flush=True)
    if args.gen_only:
        return

    # --- 2. Load pairs; size-bucketed mixed-batch iterator (train split) ---
    mols = {}
    for seq in seqs:
        split_dir = train_dir if seq in train_seqs else val_dir
        topo, td = load_peptide(seq, split_dir)
        mols[seq] = dict(topo=topo, td=td)
    n_pairs = sum(mols[s]["td"].num_pairs for s in train_seqs)

    # Buckets: peptides grouped by padded size; each batch is drawn from one
    # bucket (pair-count-weighted) and padded only to that bucket's size.
    buckets = {}
    for s in train_seqs:
        buckets.setdefault(pad8(mols[s]["topo"].num_atoms), []).append(s)
    bucket_sizes = sorted(buckets)
    bucket_weights = np.array(
        [sum(mols[s]["td"].num_pairs for s in buckets[v]) for v in bucket_sizes],
        np.float64,
    )
    bucket_weights /= bucket_weights.sum()
    print(
        f"{n_pairs} train pairs across {len(train_seqs)} peptides; buckets: "
        + ", ".join(
            f"V<={v} x{len(buckets[v])} ({w:.0%})"
            for v, w in zip(bucket_sizes, bucket_weights)
        ),
        flush=True,
    )

    def sample_batch(batch_size, seq_pool, v_pad, gen):
        pts, row_names = [], []
        for _ in range(batch_size):
            seq = seq_pool[gen.integers(len(seq_pool))]
            m = mols[seq]
            td = m["td"]
            p = gen.integers(td.num_pairs)
            z = np.zeros((m["topo"].num_atoms, 3), np.float32)
            pts.append(
                MolDynDatapoint(
                    name=seq,
                    atom_types=m["topo"].atom_types,
                    adj_list=m["topo"].bonds.astype(np.int32),
                    atom_coords=td.coord_features[p],
                    atom_velocs=td.veloc_features[p],
                    atom_forces=z,
                    atom_coord_targets=td.coord_targets[p],
                    atom_veloc_targets=td.veloc_targets[p],
                    atom_force_targets=z,
                )
            )
            row_names.append(seq)
        return collate_dense(pts, max_atoms=v_pad), row_names

    def batches(batch_size):
        while True:
            v = bucket_sizes[rng.choice(len(bucket_sizes), p=bucket_weights)]
            yield sample_batch(batch_size, buckets[v], v, rng)

    # --- 3. Train ---
    model = build_model(
        ModelConfig(
            model_type="custom_attention_transformer_nvp",
            custom_transformer_nvp_config=CustomAttentionTransformerNVPConfig(
                atom_embedding_dim=32,
                latent_mlp_hidden_dims=(256,),
                num_coupling_layers=args.coupling,
                num_transformer_layers=args.enc_layers,
                encoder_layer_config=encoder_config(
                    args.attention, args.d_model, args.ff
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
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {args.attention}, {n_params/1e6:.1f}M params", flush=True)
    if args.load_params:
        with open(args.load_params, "rb") as f:
            params = jax.device_put(pickle.load(f))
        print(f"loaded params <- {args.load_params}", flush=True)

    # Held-out NLL probe: fixed batches from the VAL split peptides -- the
    # transfer signal during training (holdout peptides never train).
    from timewarp_tpu.training.train_step import make_eval_step

    nll_loss = make_loss(LossConfig(name="nll", random_velocs=True))
    eval_step = make_eval_step(model, nll_loss)
    vrng = np.random.default_rng(99)
    v_batches = []
    if holdout_seqs:
        hv = pad8(max(mols[s]["topo"].num_atoms for s in holdout_seqs))
        for j in range(4):
            vb, _ = sample_batch(args.batch_size, holdout_seqs, hv, vrng)
            v_batches.append(vb)

    def holdout_nll(p):
        if not v_batches:
            return float("nan")
        return float(
            np.mean([
                float(eval_step(p, b, jax.random.PRNGKey(1000 + j))["loss"])
                for j, b in enumerate(v_batches)
            ])
        )

    systems = {}  # lazily built per train seq for finetune

    def phase(params, cfg, steps, lr, tag, with_system):
        if steps <= 0:
            return params
        optimizer = build_optimizer(
            OptimizerConfig(learning_rate=lr,
                            warmup_steps=min(1000, steps // 4 + 1),
                            clip_grad_norm=1.0,
                            decay_steps=steps if args.lr_decay else None)
        )
        state = TrainState.create(params, optimizer)
        loss_fn = make_loss(
            cfg, energy_model=MixedEnergyModel() if with_system else None
        )
        step = make_train_step(model, loss_fn, optimizer, mesh=None,
                               data_augmentation=True)
        ema = jax.tree.map(jnp.copy, params) if args.ema > 0 else None
        if ema is not None:
            d = args.ema
            ema_fn = jax.jit(
                lambda e, p: jax.tree.map(lambda a, b: d * a + (1 - d) * b, e, p)
            )
        t0 = time.time()
        for i in range(steps):
            batch, row_names = next(gen)
            if with_system:
                for n in set(row_names):
                    if n not in systems:
                        systems[n] = build_system_from_preset(
                            mols[n]["topo"], args.preset
                        )[0]
                stacked = stack_systems(
                    [systems[n] for n in row_names],
                    v_pad=batch.atom_types.shape[1],
                )
                state, metrics = step(state, batch, jax.random.PRNGKey(10), stacked)
            else:
                state, metrics = step(state, batch, jax.random.PRNGKey(10))
            if ema is not None:
                ema = ema_fn(ema, state.params)
            if i % 1000 == 0 or i == steps - 1:
                extra = ""
                if "mh_acceptance_estimate" in metrics:
                    extra = f" acc~{float(metrics['mh_acceptance_estimate']):.4f}"
                if i % 5000 == 0 or i == steps - 1:
                    extra += f" holdout_nll {holdout_nll(state.params):8.3f}"
                    if ema is not None:
                        extra += f" ema {holdout_nll(ema):8.3f}"
                print(f"[{tag}] step {i:6d} loss {float(metrics['loss']):9.3f}"
                      f"{extra} ({(time.time()-t0)/(i+1)*1000:.0f} ms/step)",
                      flush=True)
            if args.save_params and i > 0 and i % 10000 == 0:
                with open(args.save_params, "wb") as f:
                    pickle.dump(jax.device_get(state.params), f)
        if ema is not None:
            r, e = holdout_nll(state.params), holdout_nll(ema)
            print(f"[{tag}] final holdout NLL: raw {r:.3f} ema {e:.3f}", flush=True)
            if e < r:
                return ema
        return state.params

    if not args.eval_only:
        params = phase(params, LossConfig(name="nll", random_velocs=True),
                       args.train_steps, args.lr, "nll", with_system=False)
        if args.save_params:
            with open(args.save_params, "wb") as f:
                pickle.dump(jax.device_get(params), f)
            side = args.save_params.replace(".pkl", ".post-nll.pkl")
            with open(side, "wb") as f:
                pickle.dump(jax.device_get(params), f)
        if args.finetune_steps:
            params = phase(
                params,
                LossConfig(name=args.finetune_loss, random_velocs=True, clamp=True,
                           high_energy_threshold=300.0, weights=(0.8, 0.2)),
                args.finetune_steps, args.lr * 0.3, "finetune", with_system=True,
            )
        if args.save_params:
            with open(args.save_params, "wb") as f:
                pickle.dump(jax.device_get(params), f)
            print(f"saved params -> {args.save_params}", flush=True)

    # --- 4. Held-out evaluation: ensemble MH + Ramachandran KL, each
    # peptide padded only to its own size ---
    report = {"attention": args.attention, "preset": args.preset,
              "train_peptides": train_seqs,
              "eval_temperature": args.eval_temperature, "holdout": {}}
    for seq in holdout_seqs:
        m = mols[seq]
        topo = m["topo"]
        V = topo.num_atoms
        vp = pad8(V)
        system = build_system_from_preset(topo, args.preset)[0]
        atom_types = jnp.asarray(np.pad(topo.atom_types, (0, vp - V)))[None]
        mask = jnp.asarray(np.arange(vp)[None] >= V)
        propose_fn, reverse_logp_fn = make_flow_proposal(
            model, atom_types, mask, temperature=args.eval_temperature,
        )
        energy_fn = make_amber_energy(system)

        def pad_propose(params, rng_, xc, xv, K, _p=propose_fn, _V=V, _vp=vp):
            yc, yv, logp = _p(
                params, rng_, jnp.pad(xc, ((0, _vp - _V), (0, 0))),
                jnp.pad(xv, ((0, _vp - _V), (0, 0))), K,
            )
            return yc[:, :_V], yv[:, :_V], logp

        def pad_reverse(params, yc, yv, xc, xv, _r=reverse_logp_fn, _V=V, _vp=vp):
            p3 = ((0, 0), (0, _vp - _V), (0, 0))
            p2 = ((0, _vp - _V), (0, 0))
            # x may be [V, 3] or per-proposal [K, V, 3] (conditional recal)
            return _r(params, jnp.pad(yc, p3), jnp.pad(yv, p3),
                      jnp.pad(xc, p3 if xc.ndim == 3 else p2),
                      jnp.pad(xv, p3 if xv.ndim == 3 else p2))

        td = m["td"]
        recal_info = None
        if args.holdout_recal:
            # Per-peptide SELF-calibration (models/recalibration.py): a short
            # on-device MD segment from the eval init state supplies the
            # stiff bond/angle marginal statistics -- it cannot cross basins
            # in ~15k steps, so no conformational information leaks from the
            # holdout trajectories; model samples are drawn at states of the
            # same segment. The recalibrated proposal density is exact in
            # both MH directions (wrap_proposal).
            from timewarp_tpu.models.recalibration import (
                build_zmatrix,
                fit_recalibration,
                wrap_proposal,
            )

            cfg_md = langevin_config(args.preset)
            x0 = jnp.asarray(td.coord_features[0])
            v0 = maxwell_boltzmann_velocities(
                system, jax.random.PRNGKey(23), cfg_md.temperature
            )
            cb, vb = jax.jit(
                lambda c, v, k: run_segment(
                    system, c, v, k, num_steps=2000, config=cfg_md
                )
            )(x0, v0, jax.random.PRNGKey(24))
            calc, _ = jax.jit(
                lambda c, v, k: sample_trajectory(
                    system, c, v, k, num_frames=256, steps_per_frame=50,
                    config=cfg_md,
                )
            )(cb, vb, jax.random.PRNGKey(25))
            data_coords = np.asarray(calc)
            samp_states = data_coords[:: max(len(data_coords) // 16, 1)][:16]
            key = jax.random.PRNGKey(26)
            draw = jax.jit(
                lambda xc, xv, k: pad_propose(params, k, xc, xv, 16)[:2]
            )
            ys, yvs = [], []
            for s in samp_states:
                key, k1, k2 = jax.random.split(key, 3)
                xv = jax.random.normal(k2, (V, 3))
                yc, yv = draw(jnp.asarray(s), xv, k1)
                ys.append(np.asarray(yc))
                yvs.append(np.asarray(yv))
            model_coords = np.concatenate(ys)
            model_velocs = np.concatenate(yvs)
            zmr = build_zmatrix(
                np.asarray(system.bond_idx), V, np.asarray(x0)
            )
            aff = fit_recalibration(
                zmr, model_coords, data_coords,
                model_velocs=model_velocs,
                data_velocs=np.random.default_rng(0)
                .standard_normal(model_velocs.shape)
                .astype(np.float32),
            )
            pad_propose, pad_reverse = wrap_proposal(
                pad_propose, pad_reverse, zmr, aff
            )
            recal_info = {
                "v_scale": float(aff.v_scale),
                "r_scale_median": float(np.median(aff.r_scale[1:])),
                "th_scale_median": float(np.median(aff.th_scale[2:])),
            }
            print(f"  [{seq}] self-recal: {recal_info}", flush=True)

        W = args.eval_walkers
        # Reference-explorer-style init: ONE dataset state for all walkers
        # (exploration.py:209,225-232) -- no basin-spread head start.
        init = jnp.tile(jnp.asarray(td.coord_features[0])[None], (W, 1, 1))
        t0 = time.time()
        res = sample_ensemble(
            params, pad_propose, pad_reverse, energy_fn,
            jnp.asarray(system.masses), float(kbT()), init,
            jax.random.PRNGKey(17), topo,
            num_proposals=args.mh_proposals,
            config=MHConfig(num_proposal_steps=16,
                            max_num_proposal_steps=args.eval_max_k),
            bins=18, segment_iters=args.eval_segment_iters,
            adaptive_parallelism=True,
        )
        dt = time.time() - t0
        md_hist = ramachandran_histogram(td.coord_features, topo, bins=18)
        kl = histogram_kl(res.hist, md_hist)
        report["holdout"][seq] = {
            "num_atoms": V,
            "v_pad": vp,
            "recal": recal_info,
            "acceptance": res.acceptance_rate,
            "proposals": res.num_proposals,
            "proposals_per_sec": res.num_proposals / dt,
            "rama_sym_kl": kl,
            "K_trace": list(res.K_trace[:20]),
        }
        print(f"MH {seq}: acc {res.acceptance_rate:.4f}, KL {kl:.2f}, "
              f"{res.num_proposals/dt:.0f} prop/s (V_pad {vp})", flush=True)
        if args.report:  # incremental write: survive mid-eval interruption
            with open(args.report, "w") as f:
                json.dump(report, f, indent=2, default=float)

    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2, default=float)
        print(f"report -> {args.report}", flush=True)
    print("RESULT", json.dumps(report["holdout"], default=float), flush=True)


if __name__ == "__main__":
    main()
