"""Isolate the physics residual vs the golden OpenMM data.

Jointly solves for (a) torsion Fourier corrections grouped by canonical
atom-TYPE quartet (how real force-field parameters are keyed, so the basis
is well-conditioned and physically meaningful) and (b) linearized per-atom
charge corrections dq (forces are ~linear in small charge changes through
Coulomb + GB). Train on even frames, validate on odd frames: a real
missing-parameter residual collapses on held-out frames; noise does not.
"""
import collections

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.energy import dihedral_angle, forces

PDB = "/root/reference/testdata/output/2olx-traj-state0.pdb"
GOLDEN = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-arrays.npz"


def main():
    topo = parse_pdb(PDB)
    system, report = build_system(topo)
    d = np.load(GOLDEN)
    pos = jnp.asarray(d["positions"], jnp.float64)
    F = np.asarray(jax.vmap(lambda p: forces(system, p))(pos))
    Fres = F - d["forces"]  # [T, V, 3]
    T, V, _ = Fres.shape
    print(f"force residual RMS {np.sqrt((Fres**2).mean()):.2f}")

    res = {r.index: r.name for r in topo.residues}
    # recover per-atom amber types via the builder's internals
    from timewarp_tpu.physics.amber.build import _assign_types_charges

    types, charges, _ = _assign_types_charges(topo)

    nbrs = [[] for _ in range(V)]
    for i, j in topo.bonds:
        nbrs[i].append(int(j))
        nbrs[j].append(int(i))

    # --- proper quartets grouped by canonical type signature ---
    groups = collections.defaultdict(list)
    for j in range(V):
        for k in nbrs[j]:
            if k <= j:
                continue
            for i in nbrs[j]:
                if i == k:
                    continue
                for l in nbrs[k]:
                    if l == j or l == i:
                        continue
                    q = (i, j, k, l)
                    s1 = tuple(types[t] for t in q)
                    s2 = tuple(reversed(s1))
                    key = min(s1, s2)
                    # reorder the instance to match the canonical direction
                    groups[key].append(q if s1 == key else tuple(reversed(q)))

    features = []
    for key, qs in sorted(groups.items()):
        name = "-".join(key)
        for n in (1, 2, 3, 4):
            features.append((f"T {name} n={n} cos", qs, n, "cos"))
            features.append((f"T {name} n={n} sin", qs, n, "sin"))
    print(f"{len(groups)} type groups -> {len(features)} torsion features")

    idx = np.array([q for (_, qs, _, _) in features for q in qs], np.int32)
    spans = np.cumsum([0] + [len(qs) for (_, qs, _, _) in features])
    ns = np.array([n for (_, _, n, _) in features], np.float64)
    is_cos = np.array([c == "cos" for (_, _, _, c) in features], bool)

    def feat_energies(coords):
        p = coords[idx]
        phi = dihedral_angle(p[:, 0], p[:, 1], p[:, 2], p[:, 3])
        out = []
        for f in range(len(features)):
            ph = phi[spans[f] : spans[f + 1]]
            v = jnp.cos(ns[f] * ph) if is_cos[f] else jnp.sin(ns[f] * ph)
            out.append(v.sum())
        return jnp.stack(out)

    A_tor = np.asarray(jax.jit(jax.vmap(jax.jacfwd(feat_energies)))(pos))
    A_tor = A_tor.transpose(0, 2, 3, 1)  # [T, V, 3, F]

    # --- linearized charge features: dF/dq_i ---
    def force_of_charges(q, coords):
        sys_q = system.replace(charges=q)
        return forces(sys_q, coords)

    q0 = jnp.asarray(system.charges, jnp.float64)
    Jq = np.asarray(
        jax.jit(jax.vmap(lambda c: jax.jacfwd(force_of_charges)(q0, c)))(pos)
    )  # [T, V, 3, V]  (dForce/dq) -- a unit charge bump changes force by J
    # Feature column f=atom i: dE/dq has force contribution -dF/dq; we solve
    # F_ours - sum(c * dF_feature) = F_golden with dF_feature = -J[..., i]
    A_q = -Jq.reshape(T, V, 3, V)

    A = np.concatenate([A_tor, -A_q], axis=-1)  # torsion cols: dE/dx = -dF
    names = [f[0] for f in features] + [
        f"Q {res[topo.atoms[i].residue_index]}{topo.atoms[i].residue_index}:"
        f"{topo.atoms[i].name} ({types[i]})"
        for i in range(V)
    ]

    train = np.arange(T) % 2 == 0
    Atr = A[train].reshape(-1, A.shape[-1])
    btr = Fres[train].reshape(-1)
    Ate = A[~train].reshape(-1, A.shape[-1])
    bte = Fres[~train].reshape(-1)

    def rms(x):
        return float(np.sqrt(np.mean(x**2)))

    for lam in (1e-3, 1e-1, 1.0):
        AtA = Atr.T @ Atr + lam * np.eye(A.shape[-1])
        c = np.linalg.solve(AtA, Atr.T @ btr)
        print(
            f"lam={lam}: train {rms(btr):.2f}->{rms(btr - Atr @ c):.2f}, "
            f"test {rms(bte):.2f}->{rms(bte - Ate @ c):.2f}"
        )

    lam = 1e-1
    AtA = Atr.T @ Atr + lam * np.eye(A.shape[-1])
    c = np.linalg.solve(AtA, Atr.T @ btr)
    order = np.argsort(np.abs(c))[::-1]
    print("\nTop coefficients (kJ/mol for T, e for Q):")
    for f in order[:45]:
        if abs(c[f]) < 0.02:
            break
        print(f"  {c[f]:+8.4f}  {names[f]}")


if __name__ == "__main__":
    main()
