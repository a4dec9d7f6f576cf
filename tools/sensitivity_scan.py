"""Full parameter-sensitivity scan of the physics residual vs golden data.

Linearizes the AMBER energy around the current parameters in EVERY family
(bond k/r0, angle k/theta0, torsion Fourier terms, LJ sigma/eps, charges,
GB radii/screens) with parameters grouped the way force fields key them
(by type signature), then least-squares the force residual onto the
sensitivity columns. Held-out validation on odd frames separates real
missing-parameter structure from noise, and the winning family tells us
where our tables diverge from the amber99sbildn + amber99_obc reference.
"""
import collections

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import _assign_types_charges, build_system
from timewarp_tpu.physics.energy import dihedral_angle, forces, potential_energy

PDB = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-state0.pdb"
GOLDEN = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-arrays.npz"


def group_by(keys):
    g = collections.defaultdict(list)
    for n, k in enumerate(keys):
        g[k].append(n)
    names = sorted(g)
    onehot = np.zeros((len(keys), len(names)))
    for c, name in enumerate(names):
        onehot[g[name], c] = 1.0
    return names, jnp.asarray(onehot)


def main():
    topo = parse_pdb(PDB)
    system, report = build_system(topo)
    types, _, _ = _assign_types_charges(topo)
    d = np.load(GOLDEN)
    pos = jnp.asarray(d["positions"], jnp.float64)
    F = np.asarray(jax.vmap(lambda p: forces(system, p))(pos))
    Fres = F - d["forces"]
    T, V, _ = Fres.shape
    print(f"start force residual RMS {np.sqrt((Fres**2).mean()):.3f}")

    sys64 = jax.tree.map(
        lambda x: x.astype(jnp.float64) if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        system,
    )

    bidx = np.asarray(system.bond_idx)
    bond_keys = [tuple(sorted((types[i], types[j]))) for i, j in bidx]
    aidx = np.asarray(system.angle_idx)
    ang_keys = [
        min((types[i], types[j], types[k]), (types[k], types[j], types[i]))
        for i, j, k in aidx
    ]
    qkeys = [
        f"{topo.residues[topo.atoms[i].residue_index].name}:{topo.atoms[i].name}"
        for i in range(V)
    ]
    ljkeys = [types[i] for i in range(V)]
    gbr = np.asarray(system.gb_radii)
    gbkeys = [f"{topo.atoms[i].element}:{gbr[i]:.3f}" for i in range(V)]

    bond_names, bond_oh = group_by(bond_keys)
    ang_names, ang_oh = group_by(ang_keys)
    q_names, q_oh = group_by(qkeys)
    lj_names, lj_oh = group_by(ljkeys)
    gb_names, gb_oh = group_by(gbkeys)

    # torsion features by canonical type quartet (cos + sin, n=1..4)
    nbrs = [[] for _ in range(V)]
    for i, j in topo.bonds:
        nbrs[i].append(int(j))
        nbrs[j].append(int(i))
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
    tor_feats = []
    for key, qs in sorted(tg.items()):
        nm = "-".join(key)
        for n in (1, 2, 3, 4):
            tor_feats.append((f"tor {nm} n={n} cos", qs, n, True))
            tor_feats.append((f"tor {nm} n={n} sin", qs, n, False))
    tq = np.array([q for (_, qs, _, _) in tor_feats for q in qs], np.int32)
    tspan = np.cumsum([0] + [len(qs) for (_, qs, _, _) in tor_feats])
    tns = np.array([n for (_, _, n, _) in tor_feats], np.float64)
    tcos = np.array([c for (_, _, _, c) in tor_feats], bool)

    sections = [
        ("bond_k", [f"bond_k {'-'.join(k)}" for k in bond_names]),
        ("bond_r0", [f"bond_r0 {'-'.join(k)}" for k in bond_names]),
        ("ang_k", [f"ang_k {'-'.join(k)}" for k in ang_names]),
        ("ang_t0", [f"ang_t0 {'-'.join(k)}" for k in ang_names]),
        ("charge", [f"q {k}" for k in q_names]),
        ("lj_sig", [f"lj_sig {k}" for k in lj_names]),
        ("lj_eps", [f"lj_eps {k}" for k in lj_names]),
        ("gb_rad", [f"gb_rad {k}" for k in gb_names]),
        ("gb_scr", [f"gb_scr {k}" for k in gb_names]),
        ("tor", [f[0] for f in tor_feats]),
    ]
    sizes = dict(
        bond_k=len(bond_names), bond_r0=len(bond_names),
        ang_k=len(ang_names), ang_t0=len(ang_names),
        charge=len(q_names), lj_sig=len(lj_names), lj_eps=len(lj_names),
        gb_rad=len(gb_names), gb_scr=len(gb_names), tor=len(tor_feats),
    )
    offs, total = {}, 0
    for nm, _ in sections:
        offs[nm] = total
        total += sizes[nm]
    print(f"{total} sensitivity columns")

    # Characteristic scales so the ridge penalizes comparable physical moves.
    scale = np.ones(total)
    scale[offs["bond_k"] : offs["bond_k"] + sizes["bond_k"]] = 1e4  # kJ/nm^2
    scale[offs["bond_r0"] : offs["bond_r0"] + sizes["bond_r0"]] = 1e-3  # nm
    scale[offs["ang_k"] : offs["ang_k"] + sizes["ang_k"]] = 50.0
    scale[offs["ang_t0"] : offs["ang_t0"] + sizes["ang_t0"]] = 0.01  # rad
    scale[offs["charge"] : offs["charge"] + sizes["charge"]] = 0.01  # e
    scale[offs["lj_sig"] : offs["lj_sig"] + sizes["lj_sig"]] = 1e-3
    scale[offs["lj_eps"] : offs["lj_eps"] + sizes["lj_eps"]] = 0.05
    scale[offs["gb_rad"] : offs["gb_rad"] + sizes["gb_rad"]] = 1e-3
    scale[offs["gb_scr"] : offs["gb_scr"] + sizes["gb_scr"]] = 0.01
    scale[offs["tor"] : offs["tor"] + sizes["tor"]] = 1.0  # kJ/mol
    scale_j = jnp.asarray(scale)

    def pert_energy(eps, coords):
        eps = eps * scale_j

        def sec(nm):
            return eps[offs[nm] : offs[nm] + sizes[nm]]

        s = sys64.replace(
            bond_k=sys64.bond_k + bond_oh @ sec("bond_k"),
            bond_r0=sys64.bond_r0 + bond_oh @ sec("bond_r0"),
            angle_k=sys64.angle_k + ang_oh @ sec("ang_k"),
            angle_theta0=sys64.angle_theta0 + ang_oh @ sec("ang_t0"),
            charges=sys64.charges + q_oh @ sec("charge"),
            lj_sigma=sys64.lj_sigma + lj_oh @ sec("lj_sig"),
            lj_epsilon=sys64.lj_epsilon + lj_oh @ sec("lj_eps"),
            gb_radii=sys64.gb_radii + gb_oh @ sec("gb_rad"),
            gb_screen=sys64.gb_screen + gb_oh @ sec("gb_scr"),
        )
        e = potential_energy(s, coords)
        p = coords[tq]
        phi = dihedral_angle(p[:, 0], p[:, 1], p[:, 2], p[:, 3])
        te = sec("tor")
        vals = jnp.where(
            jnp.asarray(tcos)[:, None],
            jnp.cos(tns[:, None] * phi[None, :]),
            jnp.sin(tns[:, None] * phi[None, :]),
        )
        mask = (jnp.arange(len(phi))[None, :] >= jnp.asarray(tspan[:-1])[:, None]) & (
            jnp.arange(len(phi))[None, :] < jnp.asarray(tspan[1:])[:, None]
        )
        e = e + (te * (vals * mask).sum(1)).sum()
        return e

    z = jnp.zeros(total)
    colfn = jax.jit(
        lambda c: jax.jacfwd(jax.grad(pert_energy, argnums=1), argnums=0)(z, c)
    )
    cols = []
    for t in range(T):
        cols.append(np.asarray(colfn(pos[t])))
    Acols = -np.stack(cols)  # force change per unit eps: [T, V, 3, total]

    train = np.arange(T) % 2 == 0
    Atr = Acols[train].reshape(-1, total)
    btr = Fres[train].reshape(-1)
    Ate = Acols[~train].reshape(-1, total)
    bte = Fres[~train].reshape(-1)

    def rms(x):
        return float(np.sqrt(np.mean(x**2)))

    for lam in (1e-2, 1e-1, 1.0, 10.0):
        AtA = Atr.T @ Atr + lam * np.eye(total)
        c = np.linalg.solve(AtA, Atr.T @ btr)
        print(
            f"lam={lam}: train {rms(btr):.2f}->{rms(btr - Atr @ c):.2f}, "
            f"test {rms(bte):.2f}->{rms(bte - Ate @ c):.2f}"
        )

    lam = 1.0
    AtA = Atr.T @ Atr + lam * np.eye(total)
    c = np.linalg.solve(AtA, Atr.T @ btr)

    # per-family ablation: test-residual using only that family's columns
    names_flat = [n for _, ns in sections for n in ns]
    print("\nfamily contributions (test RMS with only that family zeroed):")
    full = rms(bte - Ate @ c)
    for nm, _ in sections:
        cz = c.copy()
        cz[offs[nm] : offs[nm] + sizes[nm]] = 0.0
        print(f"  drop {nm:8s}: {rms(bte - Ate @ cz):.2f} (full {full:.2f})")

    order = np.argsort(np.abs(c))[::-1]
    print("\nTop coefficients (in scaled units, value = eps * scale):")
    for f in order[:50]:
        phys = c[f] * scale[f]
        if abs(c[f]) < 0.05:
            break
        print(f"  eps={c[f]:+8.3f} phys={phys:+10.5f}  {names_flat[f]}")


if __name__ == "__main__":
    main()

# --- appended: single-family diagnostics (run with --single) ---
