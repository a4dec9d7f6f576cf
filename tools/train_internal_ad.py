"""Train an internal-coordinate flow (models/internal_flow.py) on AD pairs
and probe its MH acceptance during training.

The round-4 investigation (ROUND4.md) showed the Cartesian flagship's MH
acceptance is blocked by conditional-manifold sharpness that no exact
eval-time surgery can fix; this trains the round-5 architecture where the
stiff channels are internal coordinates by construction. Runs on CPU at
reduced scale when the TPU tunnel is down (--cpu).

Usage:
  python tools/train_internal_ad.py runs/ad_dataC.npz --steps 5000 \
      --out runs/iflow_ad.pkl [--cpu]
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
import optax

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.models.constructor import (
    ConditionalFlowDensityConfig,
    CustomAttentionTransformerNVPConfig,
    ModelConfig,
    build_model,
)
from timewarp_tpu.models.internal_flow import (
    InternalFlow,
    make_internal_flow_proposal,
)
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.models.recalibration import build_zmatrix
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.sampling.mh import make_amber_energy

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data")
    ap.add_argument("--out", default="runs/iflow_ad.pkl")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--d-model", type=int, default=48)
    ap.add_argument("--ff", type=int, default=192)
    ap.add_argument("--coupling", type=int, default=4)
    ap.add_argument("--enc-layers", type=int, default=1)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--probe-every", type=int, default=1000)
    ap.add_argument("--probe-k", type=int, default=64)
    ap.add_argument("--max-pairs", type=int, default=40000)
    ap.add_argument("--cartesian", action="store_true",
                    help="matched-baseline arm: identical architecture, "
                         "data, steps, and probe, but the standard "
                         "Cartesian displacement target")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    V = topo.num_atoms
    md = np.load(args.data)
    raw = md["coords"]
    pair_x = raw[:, :-1].reshape(-1, V, 3)
    pair_y = raw[:, 1:].reshape(-1, V, 3)
    rng = np.random.default_rng(0)
    sel = rng.choice(pair_x.shape[0], size=min(args.max_pairs, pair_x.shape[0]),
                     replace=False)
    n_val = max(len(sel) // 20, 64)
    val_sel, train_sel = sel[:n_val], sel[n_val:]
    xs = jnp.asarray(pair_x[train_sel])
    ys = jnp.asarray(pair_y[train_sel])
    xv_val = jnp.asarray(pair_x[val_sel])
    yv_val = jnp.asarray(pair_y[val_sel])

    zm = build_zmatrix(np.asarray(system.bond_idx), V, topo.positions)
    model = build_model(
        ModelConfig(
            model_type="custom_attention_transformer_nvp",
            custom_transformer_nvp_config=CustomAttentionTransformerNVPConfig(
                atom_embedding_dim=args.embed,
                latent_mlp_hidden_dims=(64,),
                num_coupling_layers=args.coupling,
                num_transformer_layers=args.enc_layers,
                conditional_flow_density=ConditionalFlowDensityConfig(
                    use_displacement_as_target=args.cartesian
                ),
                encoder_layer_config=CustomAttentionEncoderConfig(
                    d_model=args.d_model, dim_feedforward=args.ff, num_heads=4,
                    attention_type="kernel",
                    lengthscales=(0.1, 0.2, 0.5, 1.0),
                ),
            ),
        )
    )
    iflow = InternalFlow(model=model, zm=zm)
    center = iflow.template_center(topo.positions)
    if args.cartesian:
        print("MODE: Cartesian baseline arm", flush=True)
    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    coords0 = jnp.asarray(topo.positions)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), atom_types, coords0[None],
        jnp.zeros((1, V, 3)), jnp.zeros((1, V, 3)), jnp.zeros((1, V, 3)), mask,
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"internal flow: {n_params/1e6:.2f}M params, "
          f"{len(train_sel)} train pairs", flush=True)

    dead = 1.0 - iflow._grids()[0]

    def pair_nll(params, x, y, key):
        kv1, kv2, kg = jax.random.split(key, 3)
        xv = jax.random.normal(kv1, (V, 3))
        yv = jax.random.normal(kv2, (V, 3))
        if args.cartesian:
            lp = model.apply(
                params, atom_types, x[None], xv[None], y[None], yv[None],
                mask, method="log_likelihood",
            )
            return -lp[0] / V
        ghost = jax.random.normal(kg, (V, 3)) * dead
        lp = iflow.log_likelihood(
            params, atom_types, x, xv, y[None], yv[None], mask, center,
            ghost[None],
        )
        return -lp[0] / V

    def loss_fn(params, xb, yb, key):
        keys = jax.random.split(key, xb.shape[0])
        return jax.vmap(lambda x, y, k: pair_nll(params, x, y, k))(
            xb, yb, keys
        ).mean()

    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.01)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb, key):
        l, g = jax.value_and_grad(loss_fn)(params, xb, yb, key)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    @jax.jit
    def val_nll(params, key):
        keys = jax.random.split(key, xv_val.shape[0])
        return jax.vmap(lambda x, y, k: pair_nll(params, x, y, k))(
            xv_val, yv_val, keys
        ).mean()

    # MH acceptance probe with the real AMBER energy
    energy_fn = make_amber_energy(system)
    if args.cartesian:
        from timewarp_tpu.sampling.mh import make_flow_proposal

        propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types, mask)
    else:
        propose_fn, reverse_logp_fn = make_internal_flow_proposal(
            iflow, atom_types, mask, center
        )
    kin = lambda v: 0.5 * jnp.sum(v**2, axis=(-2, -1))
    probe_states = [pair_x[train_sel[0]], pair_x[train_sel[len(train_sel) // 2]]]

    @jax.jit
    def probe_one(params, xc, k):
        k1, k2 = jax.random.split(k)
        xv = jax.random.normal(k1, (V, 3))
        yc, yv, lp = propose_fn(params, k2, xc, xv, args.probe_k)
        expo = (
            (energy_fn(yc) - energy_fn(xc)) + (kin(yv) - kin(xv)) + lp
            - reverse_logp_fn(params, yc, yv, xc, xv)
        )
        return energy_fn(yc) - energy_fn(xc), expo

    def probe(params, tag):
        des, exps = [], []
        for si, st in enumerate(probe_states):
            for rep in range(2):
                de, ex = probe_one(
                    params, jnp.asarray(st), jax.random.PRNGKey(900 + 10 * si + rep)
                )
                des.append(np.asarray(de))
                exps.append(np.asarray(ex))
        des, exps = np.concatenate(des), np.concatenate(exps)
        acc = np.exp(np.minimum(-exps, 0.0))
        print(
            f"[probe {tag}] dE_pot med {np.median(des):+8.1f} kT  exponent "
            f"med {np.median(exps):+8.1f} std {exps.std():7.1f}  acc mean "
            f"{acc.mean():.4f}  P(acc>1%) {(acc > 0.01).mean():.3f}",
            flush=True,
        )
        return float(acc.mean())

    key = jax.random.PRNGKey(11)
    t0 = time.time()
    best_acc = -1.0
    for i in range(args.steps):
        idx = jnp.asarray(rng.choice(len(train_sel), args.batch, replace=False))
        key, k = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, xs[idx], ys[idx], k)
        if i % 200 == 0 or i == args.steps - 1:
            print(f"step {i:6d} loss {float(l):8.3f} "
                  f"({(time.time()-t0)/(i+1)*1000:.0f} ms/step)", flush=True)
        if (i > 0 and i % args.probe_every == 0) or i == args.steps - 1:
            v = float(val_nll(params, jax.random.PRNGKey(99)))
            print(f"[val] step {i} nll {v:8.3f}", flush=True)
            acc = probe(params, f"step{i}")
            if acc >= best_acc:
                best_acc = acc
                with open(args.out, "wb") as f:
                    pickle.dump(jax.device_get(params), f)
    print(f"best probed acceptance {best_acc:.4f}; saved {args.out}", flush=True)


if __name__ == "__main__":
    main()
