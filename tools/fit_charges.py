"""Refine residue-template partial charges against the reference's golden
OpenMM forces (simulation/testdata/implicit-2olx-traj-cpu-arrays.npz).

The embedded ff94 charge tables (physics/amber/residues.py) are written from
the published force field; the terminal-residue variants are the least
certain entries. This script treats per-(template, atom-name) charge deltas
as free parameters, constrains each residue template to keep its integer
total charge, and minimizes the force MSE (+ energy fluctuation error)
over the 40 golden frames with Adam. Fitted tables are printed for baking
back into residues.py.

Run: python tools/fit_charges.py
"""
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np
import optax

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.amber.residues import normalize_h_name
from timewarp_tpu.physics.energy import potential_energy

STATE0 = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-state0.pdb"
GOLDEN = "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-arrays.npz"


def template_key(topology, atom_index):
    a = topology.atoms[atom_index]
    res = topology.residues[a.residue_index]
    names = {normalize_h_name(topology.atoms[i].name) for i in res.atom_indices}
    prefix = ""
    if "OXT" in names:
        prefix = "C-"
    elif ("H2" in names or "H3" in names) and res.name not in ("ACE", "NME", "NHE"):
        prefix = "N-"
    name = normalize_h_name(a.name)
    if prefix == "N-" and name == "H":
        name = "H1"
    return (prefix + res.name, name)


def main():
    topo = parse_pdb(STATE0)
    d = np.load(GOLDEN)
    pos = jnp.asarray(d["positions"])
    gF = jnp.asarray(d["forces"])
    gE = jnp.asarray(d["energies"][:, 0])

    system, report = build_system(topo, gb_model="obc2")
    system = dataclasses.replace(system, use_reaction_field=False)

    keys = [template_key(topo, i) for i in range(topo.num_atoms)]
    uniq = sorted(set(keys))
    key_id = np.array([uniq.index(k) for k in keys])
    n_groups = len(uniq)
    print(f"{topo.num_atoms} atoms, {n_groups} template-tied charge groups")

    # Instance count per group (for the charge-conservation projection per
    # residue template).
    # Group templates by residue-template name for the sum constraint.
    res_names = sorted(set(k[0] for k in uniq))
    res_of_group = np.array([res_names.index(k[0]) for k in uniq])
    counts = np.zeros(n_groups)
    for k in key_id:
        counts[k] += 1

    q0 = jnp.asarray(system.charges)

    def charges_from(delta_g):
        # Project: within each residue template, instance-weighted deltas
        # sum to zero -> template total charge preserved.
        for r in range(len(res_names)):
            m = res_of_group == r
            w = counts * m
            delta_g = delta_g - m * (delta_g * w).sum() / np.maximum(w.sum(), 1)
        return q0 + delta_g[key_id]

    def loss_fn(delta_g):
        q = charges_from(delta_g)
        sys_q = dataclasses.replace(system, charges=q)

        def per_frame(p):
            e, g = jax.value_and_grad(lambda c: potential_energy(sys_q, c))(p)
            return e, -g

        E, F = jax.vmap(per_frame)(pos)
        f_mse = ((F - gF) ** 2).mean()
        e_diff = E - gE
        e_var = ((e_diff - e_diff.mean()) ** 2).mean()
        return f_mse / 1e4 + e_var / 10.0, (f_mse, e_var, e_diff.mean())

    delta = jnp.zeros(n_groups)
    opt = optax.adam(2e-3)
    state = opt.init(delta)

    @jax.jit
    def step(delta, state):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(delta)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(delta, updates), state, loss, aux

    for it in range(401):
        delta, state, loss, (f_mse, e_var, e_off) = step(delta, state)
        if it % 50 == 0:
            print(
                f"it {it:4d} loss {float(loss):9.4f} force_rmse "
                f"{float(jnp.sqrt(f_mse)):7.2f} e_std {float(jnp.sqrt(e_var)):6.2f} "
                f"e_off {float(e_off):8.2f}"
            )

    q = charges_from(delta)
    print("\nfinal per-group charges (template, atom, q0 -> q):")
    qg0 = {}
    for i, k in enumerate(keys):
        qg0[k] = float(q0[i])
    qg = {}
    for i, k in enumerate(keys):
        qg[k] = float(q[i])
    for k in uniq:
        print(f"  {k[0]:7s} {k[1]:5s} {qg0[k]: .4f} -> {qg[k]: .4f}  (d={qg[k]-qg0[k]:+.4f})")

    # Final quality report.
    sys_q = dataclasses.replace(system, charges=q)
    F = jax.vmap(lambda p: -jax.grad(lambda c: potential_energy(sys_q, c))(p))(pos)
    err = jnp.linalg.norm(F - gF, axis=-1)
    print(
        "\nforce err: median", float(jnp.median(err)),
        "p95", float(jnp.percentile(err, 95)), "max", float(err.max()),
    )


if __name__ == "__main__":
    main()
