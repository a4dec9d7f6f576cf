"""Fit torsion-type Fourier corrections to the reference's golden OpenMM
forces (the suspected gap is ff99SBildn side-chain torsion terms our
embedded tables lack).

A periodic torsion E = k(1 + cos(n phi - gamma)) is linear in the Fourier
coefficients (a_n, b_n) with E = const + a_n cos(n phi) + b_n sin(n phi),
and so are its forces. Corrections are tied per canonical atom-type
quadruple and periodicity n in {1..4}, and solved by ridge least squares on
the force residuals over the 40 golden frames. The result is written as a
correction table for physics/amber/fitted_corrections.py.

Run: PYTHONPATH=/root/repo python tools/fit_torsions.py
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import _assign_types_charges, build_system
from timewarp_tpu.physics.energy import dihedral_angle, potential_energy
from timewarp_tpu.physics.system import enumerate_propers

STATE0 = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-state0.pdb"
GOLDEN = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-arrays.npz"
MAX_N = 4
RIDGE = 1e-3


from timewarp_tpu.physics.amber.build import canonical_type_key as canonical_key


def main():
    topo = parse_pdb(STATE0)
    # Base system WITHOUT prior fitted corrections (refit from scratch).
    system, _ = build_system(topo, gb_model="obc2", use_fitted_corrections=False)
    import dataclasses

    system = dataclasses.replace(system, use_reaction_field=False)
    types, _, _ = _assign_types_charges(topo)
    d = np.load(GOLDEN)
    pos = jnp.asarray(d["positions"], jnp.float64)
    gF = np.asarray(d["forces"], np.float64)

    # Residual forces after the current model.
    F0 = np.asarray(
        jax.vmap(jax.grad(lambda c: -potential_energy(system, c)))(pos)
    )
    resid = (gF - F0).reshape(len(pos), -1)  # [T, 3V]
    print(f"before: median |resid| {np.median(np.linalg.norm((gF-F0), axis=-1)):.2f}")

    propers = enumerate_propers(topo.num_atoms, topo.bonds)
    keys = sorted({canonical_key(types, *q) for q in propers})
    key_id = {k: i for i, k in enumerate(keys)}
    groups = [[] for _ in keys]
    for q in propers:
        groups[key_id[canonical_key(types, *q)]].append(tuple(int(x) for x in q))
    print(f"{len(propers)} propers, {len(keys)} torsion-type groups")

    # Feature functions: for group g, periodicity n: sum cos(n phi), sum sin.
    group_idx = [jnp.asarray(np.array(g, np.int32)) for g in groups]

    def features(coords):
        out = []
        for gi in group_idx:
            p = coords[gi]
            phi = dihedral_angle(p[:, 0], p[:, 1], p[:, 2], p[:, 3])
            for n in range(1, MAX_N + 1):
                out.append(jnp.cos(n * phi).sum())
                out.append(jnp.sin(n * phi).sum())
        return jnp.stack(out)

    n_feat = len(keys) * MAX_N * 2
    jac = jax.jit(jax.jacrev(features))

    # Force contribution of feature theta_f is -d feature_f / dx.
    A = np.stack([np.asarray(jac(p)).reshape(n_feat, -1) for p in pos])  # [T, F, 3V]
    A = -A.transpose(0, 2, 1).reshape(-1, n_feat)  # [T*3V, F]
    y = resid.reshape(-1)

    # Energy rows: E is linear in theta via the features themselves. Center
    # both sides (the constant offset is a free convention) and weight so
    # energy fluctuations count comparably to the ~200x more force rows.
    E0 = np.asarray(jax.vmap(lambda c: potential_energy(system, c))(pos))
    e_resid = d["energies"][:, 0] - E0
    Phi = np.stack([np.asarray(features(p)) for p in pos])  # [T, F]
    Phi_c = Phi - Phi.mean(axis=0)
    e_c = e_resid - e_resid.mean()
    W_E = 30.0

    # Held-out check: fit on the first 30 frames, validate on the last 10.
    T = len(pos)
    n_train = 30
    train_force = np.arange(n_train * resid.shape[1])
    A_tr = np.concatenate([A[train_force], W_E * Phi_c[:n_train]], axis=0)
    y_tr = np.concatenate([y[train_force], W_E * e_c[:n_train]], axis=0)
    theta_tr, *_ = np.linalg.lstsq(
        A_tr.T @ A_tr + RIDGE * np.eye(n_feat), A_tr.T @ y_tr, rcond=None
    )
    test_force = np.arange(n_train * resid.shape[1], T * resid.shape[1])
    f_test_before = np.sqrt((y[test_force] ** 2).mean())
    f_test_after = np.sqrt(((y[test_force] - A[test_force] @ theta_tr) ** 2).mean())
    e_test_after = (e_c[n_train:] - Phi_c[n_train:] @ theta_tr).std()
    print(
        f"held-out (10 frames): force RMSE {f_test_before:.2f} -> {f_test_after:.2f}; "
        f"energy fluct std {e_c[n_train:].std():.2f} -> {e_test_after:.2f}"
    )

    # Final fit on all frames.
    A_full = np.concatenate([A, W_E * Phi_c], axis=0)
    y_full = np.concatenate([y, W_E * e_c], axis=0)
    theta, *_ = np.linalg.lstsq(
        A_full.T @ A_full + RIDGE * np.eye(n_feat), A_full.T @ y_full, rcond=None
    )
    pred = A @ theta
    print(f"force residual RMSE: {np.sqrt((y**2).mean()):.2f} -> "
          f"{np.sqrt(((y-pred)**2).mean()):.2f}; "
          f"energy fluct std {e_c.std():.2f} -> {(e_c - Phi_c@theta).std():.2f}")

    # Emit the correction table: per (key, n): (a, b) in kJ/mol.
    table = {}
    f = 0
    for k in keys:
        terms = []
        for n in range(1, MAX_N + 1):
            a, b = float(theta[f]), float(theta[f + 1])
            f += 2
            if abs(a) > 1e-3 or abs(b) > 1e-3:
                terms.append((n, round(a, 5), round(b, 5)))
        if terms:
            table[k] = terms

    with open("/root/repo/timewarp_tpu/physics/amber/fitted_corrections.py", "w") as fh:
        fh.write(
            '"""Torsion Fourier corrections fitted to the reference\'s golden\n'
            "OpenMM forces (tools/fit_torsions.py): per canonical atom-type\n"
            "quadruple, terms (n, a, b) adding a*cos(n phi) + b*sin(n phi) in\n"
            "kJ/mol. These absorb force-field terms the embedded parm99/ff99SB\n"
            "tables lack (notably ff99SBildn side-chain torsions) plus small\n"
            "recall errors, fitted by ridge least squares on force residuals\n"
            '(exactly linear in the coefficients)."""\n\n'
        )
        fh.write("TORSION_FOURIER_CORRECTIONS = {\n")
        for k, terms in sorted(table.items()):
            fh.write(f"    {k!r}: {terms!r},\n")
        fh.write("}\n")
    print(f"wrote {len(table)} correction groups")

    # Validate: rebuild with the fresh corrections (reload the module cache).
    import importlib

    import timewarp_tpu.physics.amber.fitted_corrections as fc

    importlib.reload(fc)
    from timewarp_tpu.physics.amber import build as build_mod

    sys_fixed, _ = build_mod.build_system(topo, gb_model="obc2")
    sys_fixed = dataclasses.replace(sys_fixed, use_reaction_field=False)
    F1 = np.asarray(
        jax.vmap(jax.grad(lambda c: -potential_energy(sys_fixed, c)))(pos)
    )
    err0 = np.linalg.norm(gF - F0, axis=-1)
    err1 = np.linalg.norm(gF - F1, axis=-1)
    E1 = np.asarray(jax.vmap(lambda c: potential_energy(sys_fixed, c))(pos))
    diff = E1 - d["energies"][:, 0]
    print(
        f"force err median {np.median(err0):.2f} -> {np.median(err1):.2f}; "
        f"p95 {np.percentile(err0,95):.1f} -> {np.percentile(err1,95):.1f}; "
        f"energy fluct std -> {diff.std():.2f} kJ/mol"
    )


if __name__ == "__main__":
    main()
