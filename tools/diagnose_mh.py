"""Diagnose where the MH chain loses Ramachandran basin crossings.

The round-1/2 chains sit in one basin (beta) for 100k+ states while the MD
ensemble is ~78% alphaR / ~21% beta. The training pairs DO cross basins
(~2.5% of 500 fs pairs), so either (a) the learned proposal assigns too
little mass to crossings, or (b) crossing proposals are disproportionately
rejected (bad energies / reverse likelihoods). This tool separates the two:

1. Proposal diagnostic: from one beta state and one alphaR state, draw N
   proposals; report the fraction landing in each basin and the mean MH
   acceptance probability of crossing vs non-crossing proposals.
2. Optional long-chain run with configurable MH feature flags (rotation,
   interleaved MD), reporting acceptance, basin occupancy, transitions,
   and symmetric Ramachandran KL vs the MD data.

Reference protocol being chased: the paper's >=1M-proposal chains with
Ramachandran parity (notebooks/Paper/speed-up-mcmc.ipynb; MH internals
utils/evaluation_utils.py:468-745).

Usage:
  python tools/diagnose_mh.py runs/ad_params10.pkl runs/ad_data4.npz \
      [--proposals 4096] [--chain-proposals 0] [--md-steps 0] [--rotate]
"""
import argparse
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
if "--f32" in sys.argv:
    # TPU matmuls default to bf16. Densities (NLL) were A/B'd insensitive
    # (round 3), but SAMPLE bond/angle energies are pm-scale-sensitive to
    # matmul noise in the reverse pass -- this flag isolates that.
    jax.config.update("jax_default_matmul_precision", "float32")
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
from timewarp_tpu.sampling.mh import (
    MHConfig,
    make_amber_energy,
    make_flow_proposal,
    sample_with_model,
)
from timewarp_tpu.utils.torsions import ramachandran, ramachandran_kl

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def basin_labels(phi, psi):
    """0 = alphaR, 1 = beta, 2 = alphaL (phi > 0)."""
    phi = np.asarray(phi).ravel()
    psi = np.asarray(psi).ravel()
    lab = np.where(phi > 0, 2, np.where((psi >= 0.7) | (psi <= -2.0), 1, 0))
    return lab


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("params")
    ap.add_argument("data")
    ap.add_argument("--proposals", type=int, default=4096)
    ap.add_argument("--chain-proposals", type=int, default=0,
                    help="if > 0, run an MH chain with ~this many proposals")
    ap.add_argument("--chain-samples", type=int, default=0,
                    help="chain length in states (default: chain-proposals // 3)")
    ap.add_argument("--md-steps", type=int, default=0)
    ap.add_argument("--rotate", action="store_true")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--save-chain", type=str, default=None)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--ff", type=int, default=2048)
    ap.add_argument("--coupling", type=int, default=8)
    ap.add_argument("--enc-layers", type=int, default=3)
    ap.add_argument("--f32", action="store_true",
                    help="force float32 matmul precision")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU tunnel is single-client)")
    ap.add_argument("--temperature", type=float, default=1.0,
                    help="proposal temperature (latent prior scale multiplier; "
                         "MH stays exact, see flow.conditional_sample_with_logp)")
    ap.add_argument("--veloc-temperature", type=float, default=None)
    ap.add_argument("--recal", type=str, default=None,
                    help="path to a fitted internal-coordinate recalibration "
                         "(tools/fit_recalibration.py); proposals are pushed "
                         "through it with the exact density correction")
    ap.add_argument("--temp-sweep", type=str, default=None,
                    help="comma-separated taus: report proposal acceptance at "
                         "each temperature from both basin representatives")
    args = ap.parse_args()

    topo = parse_pdb(AD_PDB)
    system, _ = build_system(topo)
    V = topo.num_atoms
    md = np.load(args.data)
    coords = md["coords"]  # [W, T, V, 3]
    model = build_ad_model(args)
    with open(args.params, "rb") as f:
        params = jax.device_put(pickle.load(f))

    # --- basin labels of the MD data ---
    flat = coords.reshape(-1, V, 3)
    phi_md, psi_md = ramachandran(jnp.asarray(flat[::4]), topo)
    lab_md = basin_labels(phi_md, psi_md)
    occ = [float((lab_md == b).mean()) for b in range(3)]
    print(f"MD basins: alphaR {occ[0]:.3f} beta {occ[1]:.3f} alphaL {occ[2]:.3f}")

    # pick one representative state per basin
    sub = flat[::4]
    idx_beta = int(np.nonzero(lab_md == 1)[0][0])
    idx_alpha = int(np.nonzero(lab_md == 0)[0][0])

    atom_types1 = jnp.asarray(topo.atom_types[None])
    mask1 = jnp.zeros((1, V), bool)
    recal = None
    if args.recal:
        from timewarp_tpu.models.recalibration import load_recalibration

        recal = load_recalibration(args.recal)
        print(f"recalibration: {args.recal} (v_scale {recal[1].v_scale:.4f})")
    propose_fn, reverse_logp_fn = make_flow_proposal(
        model, atom_types1, mask1,
        temperature=args.temperature, veloc_temperature=args.veloc_temperature,
        recalibration=recal,
    )
    energy_fn = make_amber_energy(system)
    masses = jnp.asarray(system.masses)
    kT = float(kbT())

    def make_diag(p_fn, r_fn, n_proposals):
        @jax.jit
        def diag(x_coords, rng):
            # Mirrors mh_segment's body exactly (sampling/mh.py:225-273):
            # resampled unit-variance x velocities condition both directions;
            # energy_fn returns kT units; kinetic = 0.5|v|^2.
            k1, k2 = jax.random.split(rng)
            x_velocs = jax.random.normal(k2, (V, 3))
            yc, yv, logp_xy = p_fn(params, k1, x_coords, x_velocs, n_proposals)
            e_x = energy_fn(x_coords)
            e_y = energy_fn(yc)
            kin_x = 0.5 * jnp.sum(x_velocs**2, axis=(-2, -1))
            kin_y = 0.5 * jnp.sum(yv**2, axis=(-2, -1))
            logp_yx = r_fn(params, yc, yv, x_coords, x_velocs)
            log_acc = -((e_y - e_x) + (kin_y - kin_x) + logp_xy - logp_yx)
            parts = {
                "dE_pot": e_y - e_x,
                "dE_kin": kin_y - kin_x,
                "logp_xy": logp_xy,
                "logp_yx": logp_yx,
            }
            return yc, jnp.minimum(log_acc, 0.0), parts

        return diag

    diag = make_diag(propose_fn, reverse_logp_fn, args.proposals)

    @jax.jit
    def data_pair_acc(x_coords, y_coords, rng):
        """MH exponent when the 'proposal' is the data's own MD successor:
        separates 'proposals are bad' from 'the acceptance math/energies
        reject even genuine transitions'."""
        k1, k2 = jax.random.split(rng)
        x_velocs = jax.random.normal(k1, (V, 3))
        y_velocs = jax.random.normal(k2, y_coords.shape)
        e_x = energy_fn(x_coords)
        e_y = energy_fn(y_coords)
        kin_x = 0.5 * jnp.sum(x_velocs**2, axis=(-2, -1))
        kin_y = 0.5 * jnp.sum(y_velocs**2, axis=(-2, -1))
        logp_xy = model.apply(
            params, jnp.tile(atom_types1, (y_coords.shape[0], 1)),
            jnp.broadcast_to(x_coords, y_coords.shape),
            jnp.broadcast_to(x_velocs, y_coords.shape), y_coords, y_velocs,
            jnp.tile(mask1, (y_coords.shape[0], 1)), method="log_likelihood",
        )
        logp_yx = reverse_logp_fn(params, y_coords, y_velocs, x_coords, x_velocs)
        log_acc = -((e_y - e_x) + (kin_y - kin_x) + logp_xy - logp_yx)
        return jnp.minimum(log_acc, 0.0), e_y - e_x, logp_xy - logp_yx

    # --- data-pair acceptance: genuine MD successors as proposals ---
    W_, T_ = coords.shape[:2]
    rngs = jax.random.PRNGKey(123)
    n_pairs = 256
    xs = coords[0, :n_pairs]
    ys = coords[0, 1 : n_pairs + 1]
    accs, des, dlogs = [], [], []
    for i in range(0, n_pairs, 64):
        la, de, dl = data_pair_acc(
            jnp.asarray(xs[i]), jnp.asarray(ys[i : i + 64]),
            jax.random.fold_in(rngs, i),
        )
        accs.append(np.exp(np.asarray(la)))
        des.append(np.asarray(de))
        dlogs.append(np.asarray(dl))
    accs = np.concatenate(accs); des = np.concatenate(des); dlogs = np.concatenate(dlogs)
    print(
        f"data-pair 'proposals' (MD successors of frame i, 64 targets each): "
        f"acc mean {accs.mean():.4f} med {np.median(accs):.2e}; "
        f"dE_pot med {np.median(des):+.1f} kT; (logp_xy - logp_yx) med {np.median(dlogs):+.1f}",
        flush=True,
    )

    if args.temp_sweep:
        # Proposal-only acceptance at each temperature, from both basin
        # representatives. Uses 1024 proposals per (tau, basin) point; each
        # tau is a fresh compile (temperature is a trace-time constant).
        taus = [float(t) for t in args.temp_sweep.split(",")]
        print("temperature sweep (mean acc / P(acc>1%) / median dE_pot kT):")
        for tau in taus:
            p_fn, r_fn = make_flow_proposal(
                model, atom_types1, mask1, temperature=tau,
                veloc_temperature=args.veloc_temperature,
            )
            d = make_diag(p_fn, r_fn, 1024)
            row = []
            for tag, idx in (("beta", idx_beta), ("alphaR", idx_alpha)):
                x = jnp.asarray(sub[idx])
                _, log_acc, parts = d(x, jax.random.PRNGKey(5))
                acc = np.exp(np.asarray(log_acc))
                de = np.median(np.asarray(parts["dE_pot"]))
                row.append(
                    f"{tag}: {acc.mean():.4f} / {(acc > 0.01).mean():.3f} / {de:+.1f}"
                )
            print(f"  tau={tau:<5} " + "   ".join(row), flush=True)

    from timewarp_tpu.physics.energy import potential_energy_terms

    @jax.jit
    def term_delta(x_coords, y_coords):
        """Median per-term energy excess of proposals over the current
        state, in kT -- pinpoints where proposal heat lives."""
        kT_ = float(kbT())
        tx = potential_energy_terms(system, x_coords)
        ty = jax.vmap(lambda c: potential_energy_terms(system, c))(y_coords)
        return {k: (ty[k] - tx[k]) / kT_ for k in tx}

    for tag, idx in (("beta ", idx_beta), ("alphaR", idx_alpha)):
        x = jnp.asarray(sub[idx])
        yc, log_acc, parts = diag(x, jax.random.PRNGKey(0))
        td = {k: float(np.median(np.asarray(v))) for k, v in term_delta(x, yc).items()}
        print("   dE by term (median kT): "
              + " ".join(f"{k} {v:+.1f}" for k, v in td.items()), flush=True)
        phi, psi = ramachandran(yc, topo)
        lab = basin_labels(phi, psi)
        acc = np.exp(np.asarray(log_acc))
        start = basin_labels(*ramachandran(x[None], topo))[0]
        crossing = lab != start

        def s(a):
            if a.size == 0:
                return "n=0"
            return (
                f"n={a.size} mean {a.mean():.4f} med {np.median(a):.2e} "
                f"P(acc>1%) {(a > 0.01).mean():.3f} max {a.max():.3f}"
            )

        p = {k: np.asarray(v) for k, v in parts.items()}
        print(
            f"from {tag} (basin {start}): proposals land alphaR "
            f"{(lab==0).mean():.3f} beta {(lab==1).mean():.3f} alphaL {(lab==2).mean():.3f}\n"
            f"   same-basin acc: {s(acc[~crossing])}\n"
            f"   crossing   acc: {s(acc[crossing])}\n"
            f"   exponent parts (median): dE_pot {np.median(p['dE_pot']):+.1f} kT, "
            f"dE_kin {np.median(p['dE_kin']):+.1f}, logp_xy {np.median(p['logp_xy']):+.1f}, "
            f"logp_yx {np.median(p['logp_yx']):+.1f}, "
            f"(xy-yx) {np.median(p['logp_xy'] - p['logp_yx']):+.1f}",
            flush=True,
        )

    if args.chain_proposals <= 0:
        return

    # --- long chain ---
    cfg = MHConfig(
        num_proposal_steps=args.k,
        rotate=args.rotate,
        md_steps_current=args.md_steps,
    )
    md_step_fn = None
    if args.md_steps > 0:
        from timewarp_tpu.sampling.mh import make_md_step_fn

        md_step_fn = make_md_step_fn(system)
    num_samples = args.chain_samples or max(args.chain_proposals // 3, 1000)
    t0 = time.time()
    chain_coords, chain_velocs, accepted, stats = sample_with_model(
        params, propose_fn, reverse_logp_fn, energy_fn, masses, kT,
        jnp.asarray(sub[idx_beta]), jnp.zeros((V, 3)), jax.random.PRNGKey(7),
        num_samples=num_samples, config=cfg,
        adaptive_parallelism=True, segment_iters=64, md_step_fn=md_step_fn,
    )
    dt = time.time() - t0
    print(
        f"chain: {len(stats)} proposals, {num_samples} states, "
        f"acceptance {stats.acceptance_rate:.4f}, {len(stats)/dt:.0f} proposals/s wall",
        flush=True,
    )
    phi_c, psi_c = ramachandran(jnp.asarray(chain_coords), topo)
    lab_c = basin_labels(phi_c, psi_c)
    occ_c = [float((lab_c == b).mean()) for b in range(3)]
    trans = int((np.diff(lab_c) != 0).sum())
    kl = ramachandran_kl(phi_md, psi_md, phi_c, psi_c, bins=18)
    print(
        f"chain basins: alphaR {occ_c[0]:.3f} beta {occ_c[1]:.3f} alphaL {occ_c[2]:.3f}; "
        f"transitions {trans}; Ramachandran sym-KL {kl:.3f}",
        flush=True,
    )
    if args.save_chain:
        np.savez_compressed(args.save_chain, coords=np.asarray(chain_coords))
        print(f"saved chain -> {args.save_chain}")


if __name__ == "__main__":
    main()
