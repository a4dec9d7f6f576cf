"""Probe improper-torsion ordering + torsion-table hypotheses.

Features: (a) canonical-type-grouped proper torsion cos/sin terms, and
(b) for every sp2 center, all 6 improper orderings (3 out-of-plane choices
x 2 peripheral orders) as independent n=2 cos features PLUS our currently
assigned improper as a removable feature. If the residual is torsional, a
sparse exact solution exists and held-out error collapses.
"""
import collections
import itertools

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import _assign_types_charges, build_system
from timewarp_tpu.physics.energy import dihedral_angle, forces

PDB = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-state0.pdb"
GOLDEN = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-arrays.npz"


def main():
    topo = parse_pdb(PDB)
    system, report = build_system(topo)
    types, _, _ = _assign_types_charges(topo)
    d = np.load(GOLDEN)
    pos = jnp.asarray(d["positions"], jnp.float64)
    F = np.asarray(jax.vmap(lambda p: forces(system, p))(pos))
    Fres = F - d["forces"]
    T, V, _ = Fres.shape
    res = {r.index: r.name for r in topo.residues}

    def label(i):
        a = topo.atoms[i]
        return f"{res[a.residue_index]}{a.residue_index}:{a.name}"

    nbrs = [[] for _ in range(V)]
    for i, j in topo.bonds:
        nbrs[i].append(int(j))
        nbrs[j].append(int(i))

    feats = []  # (name, [quartets], n, is_cos)
    tg = collections.defaultdict(list)
    for j in range(V):
        for k in nbrs[j]:
            if k <= j:
                continue
            for i in nbrs[j]:
                if i == k:
                    continue
                for l in nbrs[k]:
                    if l in (j, i):
                        continue
                    q = (i, j, k, l)
                    s1 = tuple(types[t] for t in q)
                    key = min(s1, tuple(reversed(s1)))
                    tg[key].append(q if s1 == key else tuple(reversed(q)))
    for key, qs in sorted(tg.items()):
        nm = "-".join(key)
        for n in (1, 2, 3, 4):
            feats.append((f"tor {nm} n={n} cos", qs, n, True))
            feats.append((f"tor {nm} n={n} sin", qs, n, False))

    for c in range(V):
        if len(nbrs[c]) != 3:
            continue
        for out in nbrs[c]:
            rest = [x for x in nbrs[c] if x != out]
            for a1, a2 in (rest, rest[::-1]):
                q = (a1, a2, c, out)
                feats.append(
                    (
                        f"imp ({label(a1)},{label(a2)},[{label(c)}],{label(out)})",
                        [q],
                        2,
                        True,
                    )
                )
            # sin probes for the axis ambiguity
            feats.append(
                (f"impsin ({label(rest[0])},{label(rest[1])},[{label(c)}],{label(out)})",
                 [(rest[0], rest[1], c, out)], 2, False)
            )

    print(f"{len(feats)} features")
    tq = np.array([q for (_, qs, _, _) in feats for q in qs], np.int32)
    span = np.cumsum([0] + [len(qs) for (_, qs, _, _) in feats])
    ns = np.array([n for (_, _, n, _) in feats], np.float64)
    cosf = np.array([c for (_, _, _, c) in feats], bool)

    def feat_energies(coords):
        p = coords[tq]
        phi = dihedral_angle(p[:, 0], p[:, 1], p[:, 2], p[:, 3])
        out = []
        for f in range(len(feats)):
            ph = phi[span[f] : span[f + 1]]
            out.append((jnp.cos(ns[f] * ph) if cosf[f] else jnp.sin(ns[f] * ph)).sum())
        return jnp.stack(out)

    A = np.asarray(jax.jit(jax.vmap(jax.jacfwd(feat_energies)))(pos))
    A = A.transpose(0, 2, 3, 1)

    train = np.arange(T) % 2 == 0
    Atr = A[train].reshape(-1, len(feats))
    btr = Fres[train].reshape(-1)
    Ate = A[~train].reshape(-1, len(feats))
    bte = Fres[~train].reshape(-1)

    def rms(x):
        return float(np.sqrt(np.mean(x**2)))

    for lam in (1e-2, 1e-1, 1.0, 10.0):
        AtA = Atr.T @ Atr + lam * np.eye(len(feats))
        c = np.linalg.solve(AtA, Atr.T @ btr)
        print(
            f"lam={lam}: train {rms(btr):.2f}->{rms(btr - Atr @ c):.2f}, "
            f"test {rms(bte):.2f}->{rms(bte - Ate @ c):.2f}"
        )

    lam = 1.0
    AtA = Atr.T @ Atr + lam * np.eye(len(feats))
    c = np.linalg.solve(AtA, Atr.T @ btr)
    order = np.argsort(np.abs(c))[::-1]
    print("\nTop coefficients (kJ/mol):")
    for f in order[:40]:
        if abs(c[f]) < 0.3:
            break
        print(f"  {c[f]:+8.3f}  {feats[f][0]}")


if __name__ == "__main__":
    main()
