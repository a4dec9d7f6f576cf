"""Attribute the constant energy offset vs OpenMM (VERDICT round 3, #5).

Our JAX AMBER potential tracks OpenMM's *fluctuations* to < 1 kT but sits a
constant ~236 kJ/mol above it on the 2olx golden fixture
(tests/test_physics.py). A constant offset cancels in every MH energy
difference, but its origin was unattributed. With only ONE molecule, any
per-term split of a constant is unidentifiable -- so this tool uses every
molecule in the image that ships OpenMM-computed energies:

- /root/reference/simulation/testdata/implicit-2olx-traj-cpu-arrays.npz
  (the golden fixture, 65 atoms)
- /root/reference/testdata/output/2olx-traj-arrays.npz (same molecule,
  independent OpenMM run)
- /root/reference/testdata/output/1hgv-traj-arrays.npz (691 atoms -- a 10x
  larger protein, the lever that makes per-term counts identifiable)

and regresses the per-molecule offset against per-molecule structural
counts (atoms, residues, bonds, angles, torsion Fourier terms, impropers,
1-4 pairs, sum of torsion/improper barrier heights...). A convention-level
constant (e.g. a k(1+cos) vs k*cos torsion zero-point, or a GB/SA
self-term) scales with exactly one of these counts across molecules.

Run on CPU (f64): python tools/attribute_offset.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.physics.amber.build import build_system
from timewarp_tpu.physics.energy import potential_energy, potential_energy_terms

CASES = [
    ("2olx-golden", "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-state0.pdb",
     "/root/reference/simulation/testdata/implicit-2olx-traj-cpu-arrays.npz"),
    ("2olx-test", "/root/reference/testdata/output/2olx-traj-state0.pdb",
     "/root/reference/testdata/output/2olx-traj-arrays.npz"),
    ("1hgv-test", "/root/reference/testdata/output/1hgv-traj-state0.pdb",
     "/root/reference/testdata/output/1hgv-traj-arrays.npz"),
]


def counts(system, topo):
    """Structural counts a convention-level constant could scale with."""
    sc = np.asarray(system.scale_coul)
    iu = np.triu_indices(sc.shape[0], k=1)
    pairs14 = int(np.sum(np.isclose(sc[iu], 1.0 / 1.2, atol=1e-3)))
    c = {
        "atoms": topo.num_atoms,
        "residues": len(topo.residues),
        "bonds": len(system.bond_idx),
        "angles": len(system.angle_idx),
        "torsion_terms": len(system.torsion_idx),
        "pairs14": pairs14,
        "sum_torsion_k": float(np.abs(np.asarray(system.torsion_k)).sum()),
    }
    return c


def main():
    rows = []
    for name, pdb, npz in CASES:
        topo = parse_pdb(pdb)
        system, _ = build_system(topo)
        d = np.load(npz)
        pos = jnp.asarray(d["positions"], jnp.float64)
        terms = jax.vmap(lambda p: potential_energy_terms(system, p))(pos)
        terms = {k: np.asarray(v) for k, v in terms.items()}
        ours = sum(terms.values())
        theirs = np.asarray(d["energies"][:, 0], np.float64)
        resid = ours - theirs
        c = counts(system, topo)
        rows.append((name, float(resid.mean()), float(resid.std()), c))
        tstr = " ".join(f"{k} {float(np.mean(v)):.1f}" for k, v in terms.items())
        print(f"{name}: offset {resid.mean():+9.2f} kJ/mol (std {resid.std():.2f})")
        print(f"   counts: {c}")
        print(f"   our term means: {tstr}", flush=True)

        # Fluctuation regression: residual fluctuations onto per-term energy
        # fluctuations. A scale-convention error on one term would show as a
        # stable coefficient across molecules.
        keys = sorted(terms)
        X = np.stack([terms[k] - terms[k].mean() for k in keys], 1)
        y = resid - resid.mean()
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
        pred = X @ coef
        r2 = 1 - ((y - pred) ** 2).sum() / max((y**2).sum(), 1e-12)
        print(f"   fluctuation regression R2 {r2:.3f}: "
              + " ".join(f"{k}:{co:+.3f}" for k, co in zip(keys, coef)))

    print("\nper-count offset ratios (a convention constant makes ONE of "
          "these agree across molecules):")
    keys = rows[0][3].keys()
    hdr = f"{'count':>16} " + " ".join(f"{n:>12}" for n, *_ in rows)
    print(hdr)
    best = None
    for k in keys:
        vals = [off / c[k] if c[k] else float("nan") for _, off, _, c in rows]
        spread = (max(vals) - min(vals)) / max(abs(np.mean(vals)), 1e-9)
        print(f"{k:>16} " + " ".join(f"{v:12.4f}" for v in vals)
              + f"   rel-spread {spread:.2%}")
        if best is None or spread < best[1]:
            best = (k, spread, float(np.mean(vals)))
    k, spread, coef = best
    print(f"\nbest single-count explanation: offset ~ {coef:.4f} kJ/mol per "
          f"{k} (relative spread {spread:.2%} across molecules)")
    print(CONCLUSION)


CONCLUSION = """
Conclusion (round 4, measured by this tool in this container):
- 2olx offset +235.8 (std 1.8, golden frames) / +225.0 (std 9.0, the wider
  log-spaced testdata frames); 1hgv offset +1215.5 (std 27.7).
- The offset is NOT a per-interaction-count constant: no count ratio is
  consistent across molecules (all rel-spreads > 40%).
- It is not exactly constant either: the same molecule under a broader
  configuration distribution shifts the 'constant' by ~11 kJ/mol, so the
  residual is a smooth, slowly varying function of configuration.
- It is not the reaction-field constant (our Coulomb implements OpenMM's
  CutoffNonPeriodic reaction field, physics/energy.py:119-131) and not
  n=0 torsion zero-points (none exist in either system).
- Per-term fluctuation regression is too collinear (coulomb/gb
  anticorrelate) for a stable single-term attribution; R2 <= 0.6 with
  coefficients that flip between molecules.
- Remaining candidates are fine conventions inside OpenMM's GBSAOBCForce
  (exact OBC-II offset-radii bookkeeping, ACE-SA prefactor/probe) whose
  per-term golden decomposition cannot be produced in this image (no
  OpenMM). The offset cancels in every MH energy DIFFERENCE, so sampling
  is unaffected; the golden gate is tightened to pin the measured values
  (tests/test_physics.py) so any future physics change that moves them
  fails loudly.
"""


if __name__ == "__main__":
    main()
