"""Acceptance-gated finetune of the flagship AD flow (VERDICT round 4, #1b).

Round-2 and round-3 finetunes both failed while LOOKING fine on NLL
(ROUND3.md: "validate MH acceptance after EVERY finetune; good NLL does not
imply a usable proposal"). This driver bakes that lesson in:

- trains NLL + acceptance loss (the differentiable -log MH acceptance
  through the on-device AMBER energy, physics/losses.py:132-176 --
  reference analogue losses.py:359-556, which had to bridge into OpenMM),
- every ``--probe-every`` steps runs an in-loop PROPOSAL DIAGNOSTIC (mean
  MH acceptance, median dE_pot, median logp asymmetry over K proposals from
  one beta and one alphaR dataset state -- the tools/diagnose_mh.py
  numbers),
- keeps a side checkpoint per probe and SELECTS the checkpoint with the
  best probed acceptance, never the last one.

Usage:
  python tools/finetune_acceptance.py runs/ad_r4_base.pkl runs/ad_dataC.npz \
      --steps 20000 --weight 0.1 --out runs/ad_r4_acc.pkl
"""
import argparse
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
from timewarp_tpu.losses import LossConfig, make_loss
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.constants import kbT
from timewarp_tpu.physics.losses import EnergyModel
from timewarp_tpu.sampling.mh import make_amber_energy, make_flow_proposal
from timewarp_tpu.training.optim import OptimizerConfig, build_optimizer
from timewarp_tpu.training.train_step import TrainState, make_train_step
from timewarp_tpu.utils.torsions import ramachandran

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("params")
    ap.add_argument("data")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--weight", type=float, default=0.1,
                    help="acceptance-loss weight in the convex combination")
    ap.add_argument("--loss", default="nll_acceptance",
                    choices=["nll_acceptance", "nll_energy", "nll_bonded"])
    ap.add_argument("--lr", type=float, default=3e-5)
    ap.add_argument("--lr-decay", action="store_true")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--probe-every", type=int, default=2000)
    ap.add_argument("--probe-proposals", type=int, default=1024)
    ap.add_argument("--beta", type=float, default=0.0,
                    help="entropy bonus weight in the acceptance loss")
    ap.add_argument("--clamp", action="store_true", default=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--ff", type=int, default=2048)
    ap.add_argument("--coupling", type=int, default=8)
    ap.add_argument("--enc-layers", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from tools.diagnose_mh import basin_labels, build_ad_model
    from tools.e2e_alanine import make_batches

    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    V = topo.num_atoms
    md = np.load(args.data)
    coords, velocs = md["coords"], md["velocs"]
    model = build_ad_model(args)
    with open(args.params, "rb") as f:
        params = jax.device_put(pickle.load(f))

    # --- probe setup: one beta and one alphaR state from the data ---
    flat = coords.reshape(-1, V, 3)
    phi, psi = ramachandran(jnp.asarray(flat[::16]), topo)
    lab = basin_labels(phi, psi)
    x_beta = jnp.asarray(flat[::16][np.nonzero(lab == 1)[0][0]])
    x_alpha = jnp.asarray(flat[::16][np.nonzero(lab == 0)[0][0]])

    atom_types1 = jnp.asarray(topo.atom_types[None])
    mask1 = jnp.zeros((1, V), bool)
    propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types1, mask1)
    energy_fn = make_amber_energy(system)

    @jax.jit
    def probe_one(p, x_coords, rng):
        k1, k2 = jax.random.split(rng)
        x_velocs = jax.random.normal(k2, (V, 3))
        yc, yv, logp_xy = propose_fn(p, k1, x_coords, x_velocs,
                                     args.probe_proposals)
        e_x = energy_fn(x_coords)
        e_y = energy_fn(yc)
        kin_x = 0.5 * jnp.sum(x_velocs**2, axis=(-2, -1))
        kin_y = 0.5 * jnp.sum(yv**2, axis=(-2, -1))
        logp_yx = reverse_logp_fn(p, yc, yv, x_coords, x_velocs)
        log_acc = jnp.minimum(
            -((e_y - e_x) + (kin_y - kin_x) + logp_xy - logp_yx), 0.0
        )
        return (
            jnp.exp(log_acc).mean(),
            jnp.median(e_y - e_x),
            jnp.median(logp_xy - logp_yx),
        )

    def probe(p, tag):
        accs, des, dls = [], [], []
        for i, x in enumerate((x_beta, x_alpha)):
            a, d, l = probe_one(p, x, jax.random.PRNGKey(100 + i))
            accs.append(float(a)); des.append(float(d)); dls.append(float(l))
        print(
            f"[probe {tag}] acc beta {accs[0]:.5f} alphaR {accs[1]:.5f} | "
            f"dE_pot med {des[0]:+.1f}/{des[1]:+.1f} kT | "
            f"dlogp med {dls[0]:+.1f}/{dls[1]:+.1f}",
            flush=True,
        )
        return float(np.mean(accs))

    # --- training ---
    nprng = np.random.default_rng(5)
    gen = make_batches(coords, velocs, args.batch_size, nprng, topo)
    em = EnergyModel(system=system)
    cfg = LossConfig(
        name=args.loss, random_velocs=True, clamp=args.clamp, beta=args.beta,
        high_energy_threshold=300.0,
        weights=(1.0 - args.weight, args.weight),
    )
    loss_fn = make_loss(cfg, energy_model=em)
    optimizer = build_optimizer(
        OptimizerConfig(learning_rate=args.lr,
                        warmup_steps=min(500, args.steps // 4 + 1),
                        clip_grad_norm=1.0,
                        decay_steps=args.steps if args.lr_decay else None)
    )
    state = TrainState.create(params, optimizer)
    step = make_train_step(model, loss_fn, optimizer, mesh=None,
                           data_augmentation=True)

    best = {"acc": probe(params, "pre"), "step": -1}
    with open(args.out, "wb") as f:
        pickle.dump(jax.device_get(params), f)
    print(f"[select] baseline acc {best['acc']:.5f} -> {args.out}", flush=True)

    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, next(gen), jax.random.PRNGKey(11))
        if i % 500 == 0 or i == args.steps - 1:
            extra = ""
            if "mh_acceptance_estimate" in metrics:
                extra = f" acc~{float(metrics['mh_acceptance_estimate']):.4f}"
            print(f"[ft] step {i:6d} loss {float(metrics['loss']):9.3f}{extra} "
                  f"({(time.time()-t0)/(i+1)*1000:.0f} ms/step)", flush=True)
        if (i + 1) % args.probe_every == 0 or i == args.steps - 1:
            acc = probe(state.params, f"step{i+1}")
            side = args.out.replace(".pkl", f".step{i+1}.pkl")
            with open(side, "wb") as f:
                pickle.dump(jax.device_get(state.params), f)
            if acc > best["acc"]:
                best = {"acc": acc, "step": i + 1}
                with open(args.out, "wb") as f:
                    pickle.dump(jax.device_get(state.params), f)
                print(f"[select] new best acc {acc:.5f} (step {i+1}) "
                      f"-> {args.out}", flush=True)

    print(f"RESULT best probed acceptance {best['acc']:.5f} at step "
          f"{best['step']} (baseline included); checkpoint {args.out}",
          flush=True)


if __name__ == "__main__":
    main()
