"""Generate judge-facing evaluation artifacts from a training run:
Ramachandran maps (MD vs MH chain), energy histograms, bond-length
histograms, chain statistics, and a JSON summary.

Usage: python tools/make_report.py [--params runs/ad_params5.pkl] [--out runs/report]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=None)
    ap.add_argument("--data", default="runs/ad_data.npz")
    ap.add_argument("--out", default="runs/report")
    ap.add_argument("--mh-samples", type=int, default=8000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_model
    from timewarp_tpu.data.pdb import parse_pdb
    from timewarp_tpu.physics.amber.build import build_system
    from timewarp_tpu.physics.constants import kbT
    from timewarp_tpu.physics.energy import batched_potential_energy
    from timewarp_tpu.sampling.evaluation import (
        energy_histogram_overlap,
        kinetic_energy_ks,
    )
    from timewarp_tpu.sampling.mh import (
        MHConfig,
        make_amber_energy,
        make_flow_proposal,
        sample_with_model,
    )
    from timewarp_tpu.utils.analysis import (
        plot_bond_histograms,
        plot_energy_histograms,
        plot_ramachandran,
    )
    from timewarp_tpu.utils.params_io import load_params
    from timewarp_tpu.utils.torsions import ramachandran, ramachandran_kl

    os.makedirs(args.out, exist_ok=True)
    params_path = args.params
    if params_path is None:
        for cand in ("runs/ad_params8.pkl", "runs/ad_params7.pkl", "runs/ad_params6.pkl", "runs/ad_params5.pkl", "runs/ad_params4.pkl", "runs/ad_params2.pkl"):
            if os.path.exists(cand):
                params_path = cand
                break
    print("params:", params_path)

    topo = parse_pdb("/root/reference/simulation/testdata/alanine-dipeptide.pdb")
    system, _ = build_system(topo)
    V = topo.num_atoms
    model = _flagship_model()
    params = load_params(params_path)
    data = np.load(args.data)
    md_coords = data["coords"].reshape(-1, V, 3)

    atom_types = jnp.asarray(topo.atom_types)[None]
    mask = jnp.zeros((1, V), bool)
    propose_fn, reverse_logp_fn = make_flow_proposal(model, atom_types, mask)
    energy_fn = make_amber_energy(system)

    coords, velocs, accepted, stats = sample_with_model(
        params, propose_fn, reverse_logp_fn, energy_fn,
        jnp.asarray(system.masses), float(kbT()),
        jnp.asarray(md_coords[0]), jnp.zeros((V, 3)), jax.random.PRNGKey(1),
        num_samples=args.mh_samples, config=MHConfig(num_proposal_steps=32),
        adaptive_parallelism=True,
    )

    phi_md, psi_md = ramachandran(jnp.asarray(md_coords), topo)
    phi_mh, psi_mh = ramachandran(jnp.asarray(coords), topo)
    plot_ramachandran(phi_md, psi_md, f"{args.out}/rama_md.png", "MD (Langevin)")
    plot_ramachandran(phi_mh, psi_mh, f"{args.out}/rama_chain.png", "MH chain")

    e_md = np.asarray(batched_potential_energy(system, jnp.asarray(md_coords[:4000]))) / float(kbT())
    e_ch = np.asarray(batched_potential_energy(system, jnp.asarray(coords))) / float(kbT())
    plot_energy_histograms(e_md, e_ch, f"{args.out}/energy_hist.png")
    plot_bond_histograms(md_coords[:2000], coords, topo.bonds, f"{args.out}/bond_hist.png")

    from timewarp_tpu.utils.atoms_viewer import write_viewer_html

    write_viewer_html(
        f"{args.out}/chain_viewer.html",
        np.asarray(coords),
        [a.element for a in topo.atoms],
        topo.bonds,
        title="MH chain",
    )

    summary = {
        "params": params_path,
        "mh_acceptance": stats.acceptance_rate,
        "num_accepted": int(accepted),
        "chain_length": int(len(coords)),
        "ramachandran_kl": ramachandran_kl(phi_md, psi_md, phi_mh, psi_mh),
        # Same-potential comparison: uncentered, so a genuine mean-energy
        # shift between chain and MD (proposal heat) lowers the overlap.
        # The centered variant is co-reported for shape-only comparison.
        "energy_overlap": energy_histogram_overlap(e_md, e_ch),
        "energy_overlap_centered": energy_histogram_overlap(e_md, e_ch, center=True),
    }
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
