"""Build an AmberSystem from a parsed PDB topology.

The TPU-native replacement for OpenMM's ForceField.createSystem
(reference: simulation/md.py:128-187): residue templates assign atom types
and charges, the bond graph generates angle/torsion terms, parameter tables
supply constants, and everything lands in dense device arrays
(physics/system.py).

Impropers are added at 3-coordinated sp2 centers by wildcard lookup with the
out-of-plane atom chosen by (O > N > H > heavy) priority -- for the n=2,
phase=180 impropers used by protein force fields the outer-atom order does
not change the energy.
"""
import dataclasses
import math as _math
from typing import List, Optional, Tuple

import numpy as np

from timewarp_tpu.data.elements import ELEMENT_MASSES
from timewarp_tpu.data.pdb import Topology
from timewarp_tpu.physics.amber import params as P
from timewarp_tpu.physics.amber.residues import (
    C_TERMINAL,
    N_TERMINAL,
    RESIDUES,
    normalize_h_name,
)
from timewarp_tpu.physics.system import (
    AmberSystem,
    build_scale_matrices,
    enumerate_angles,
    enumerate_propers,
)

SP2_CENTER_TYPES = {
    "C", "CA", "CB", "CC", "CK", "CM", "CN", "CQ", "CR", "CV", "CW", "C*",
    "N", "N*", "N2", "NA",
}


@dataclasses.dataclass
class BuildReport:
    total_charge: float
    missing_dihedrals: List[Tuple[str, str, str, str]]
    fallback_terminals: List[str]


def _assign_types_charges(topology: Topology):
    """Per-atom (amber_type, charge) via residue templates with terminal
    variants."""
    n_res = len(topology.residues)
    types: List[Optional[str]] = [None] * topology.num_atoms
    charges = np.zeros(topology.num_atoms, dtype=np.float64)
    fallback_terminals: List[str] = []

    for res in topology.residues:
        atom_names = {normalize_h_name(topology.atoms[i].name): i for i in res.atom_indices}
        is_cap = res.name in ("ACE", "NME", "NHE")
        is_nterm = (
            not is_cap
            and (res.index == 0 or topology.residues[res.index - 1].chain_id != res.chain_id)
            and ("H2" in atom_names or "H3" in atom_names)
        )
        is_cterm = not is_cap and "OXT" in atom_names

        # Histidine protonation state is determined by which ring hydrogens
        # are present (OpenMM's ForceField template matching does the same
        # by atom-set; reference: simulation/md.py addHydrogens output).
        res_name = res.name
        if res_name in ("HIS", "HID", "HIE", "HIP"):
            has_hd1 = "HD1" in atom_names
            has_he2 = "HE2" in atom_names
            res_name = "HIP" if (has_hd1 and has_he2) else ("HID" if has_hd1 else "HIE")

        template = dict(RESIDUES.get(res_name) or {})
        if not template:
            raise ValueError(f"no AMBER template for residue {res.name!r}")

        if is_nterm:
            if res_name in N_TERMINAL:
                template = dict(N_TERMINAL[res_name])
            else:
                # Documented approximation: mid-chain charges, terminal
                # types, residual +1 charge placed on N.
                fallback_terminals.append(f"N-{res.name}{res.resseq}")
                template = dict(template)
                mid_total = round(sum(q for _, q in template.values()))
                n_type, n_q = template["N"]
                template["N"] = ("N3", n_q)
                template.pop("H", None)
                # Protonation adds +1 to the residue's mid-chain total.
                target = mid_total + 1.0
                h_q = (target - sum(q for _, q in template.values())) / 3.0
                for h in ("H1", "H2", "H3"):
                    template[h] = ("H", h_q)
                if "HA" in template:
                    template["HA"] = ("HP", template["HA"][1])
        if is_cterm:
            if res_name in C_TERMINAL:
                template = dict(C_TERMINAL[res_name])
            else:
                fallback_terminals.append(f"C-{res.name}{res.resseq}")
                template = dict(template)
                o_q = template["O"][1]
                total = sum(q for _, q in template.values())
                # Deprotonation subtracts 1 from the residue's mid-chain
                # total; O and OXT share the carboxylate charge:
                # sum_without_O + 2v = mid_total - 1.
                target = round(total) - 1.0
                v = (target - (total - o_q)) / 2.0
                template["O"] = ("O2", v)
                template["OXT"] = ("O2", v)

        for i in res.atom_indices:
            name = normalize_h_name(topology.atoms[i].name)
            if is_nterm and name == "H" and "H1" in template:
                name = "H1"  # OpenMM PDBs name the NH3+ protons H/H2/H3
            if name not in template:
                raise ValueError(
                    f"atom {topology.atoms[i].name!r} not in template for "
                    f"{'N-' if is_nterm else 'C-' if is_cterm else ''}{res.name}"
                )
            t, q = template[name]
            types[i] = t
            charges[i] = q

        # Renormalize the residue to its nominal integer total charge. AMBER
        # residue libraries sum to an exact integer per residue; a template
        # whose atoms don't (a transcription gap) would otherwise leave a
        # spurious net monopole on the whole molecule, which contaminates
        # Coulomb/GB forces everywhere. Distribute the residual equally so
        # the correction is minimal (L2) and confined to this residue.
        idx = list(res.atom_indices)
        res_total = float(charges[idx].sum())
        residual = res_total - round(res_total)
        # A residual beyond rounding noise signals a template transcription
        # error; snapping it to the nearest integer would bake in a wrong,
        # plausible-looking charge set. Fail loudly instead of smearing.
        if abs(residual) > 0.2:
            raise ValueError(
                f"residue {res.name} (atoms {idx[0]}..{idx[-1]}): template "
                f"charges sum to {res_total:.4f}, residual {residual:+.4f}e "
                "exceeds 0.2e — template transcription error?"
            )
        if abs(residual) > 1e-6:
            charges[idx] -= residual / len(idx)

    return types, charges, fallback_terminals


def canonical_type_key(types, i, j, k, l):
    """Direction-canonical atom-type quadruple (shared with
    tools/fit_torsions.py)."""
    a, b, c, d = types[i], types[j], types[k], types[l]
    return (a, b, c, d) if (b, c, a, d) <= (c, b, d, a) else (d, c, b, a)


def build_system(
    topology: Topology,
    cutoff: Optional[float] = 2.0,
    gb_model: Optional[str] = "obc2",
    gb_radii_set: str = "amber99_obc",  # amber99_obc | mbondi2
    strict: bool = True,
    # Torsion corrections fitted to the golden frames overfit badly
    # (held-out force RMSE degrades ~2.5x, tools/fit_torsions.py); keep the
    # machinery available but OFF until corrections come from more data or
    # the published ff99SBildn tables.
    use_fitted_corrections: bool = False,
) -> Tuple[AmberSystem, BuildReport]:
    """Parameterize a peptide. Defaults match the reference's implicit
    presets: 2 nm CutoffNonPeriodic with reaction field + OBC GB
    (amber99_obc.xml uses the OBC-II variant via GBSAOBCForce;
    amber14's implicit/obc1.xml uses OBC-I)."""
    types, charges, fallback_terminals = _assign_types_charges(topology)
    V = topology.num_atoms
    bonds = topology.bonds

    # Bonds.
    bond_k = np.zeros(len(bonds))
    bond_r0 = np.zeros(len(bonds))
    for n, (i, j) in enumerate(bonds):
        bond_k[n], bond_r0[n] = P.bond_param(types[i], types[j])

    # Angles.
    angle_idx = enumerate_angles(V, bonds)
    angle_k = np.zeros(len(angle_idx))
    angle_t0 = np.zeros(len(angle_idx))
    for n, (i, j, k) in enumerate(angle_idx):
        angle_k[n], angle_t0[n] = P.angle_param(types[i], types[j], types[k])

    # Proper torsions (+ 1-4 pair list).
    propers = enumerate_propers(V, bonds)
    t_idx: List[Tuple[int, int, int, int]] = []
    t_k: List[float] = []
    t_n: List[float] = []
    t_phase: List[float] = []
    missing: List[Tuple[str, str, str, str]] = []
    seen = set()
    pairs_14 = []
    for (i, j, k, l) in propers:
        # Skip exact reversed duplicates (each central bond is visited once,
        # but defensive for symmetric enumerations).
        if (l, k, j, i) in seen:
            continue
        seen.add((i, j, k, l))
        pairs_14.append((i, l))
        try:
            terms = P.dihedral_param(types[i], types[j], types[k], types[l])
        except KeyError:
            missing.append((types[i], types[j], types[k], types[l]))
            continue
        for kk, per, phase in terms:
            t_idx.append((i, j, k, l))
            t_k.append(kk)
            t_n.append(per)
            t_phase.append(phase)

    # Calibrated side-chain chi corrections (ildn-style; see
    # params.SIDECHAIN_CHI_CORRECTIONS). Applied only to quartets whose
    # central bond is a side-chain chi bond -- the selectivity the published
    # force field gets from its dedicated 2C/3C atom types.
    name_of = [a.name for a in topology.atoms]
    res_of = [a.residue_index for a in topology.atoms]
    res_names = {r.index: r.name for r in topology.residues}
    chi_pairs = ({"CA", "CB"}, {"CB", "CG"}, {"CG", "CD"})
    for (i, j, k, l) in seen:
        if res_of[j] != res_of[k] or res_names[res_of[j]] == "PRO":
            continue
        if {name_of[j], name_of[k]} not in chi_pairs:
            continue
        # Lexicographic-min canonicalization (must match
        # tools/calibrate_sidechains.py, which emitted the table).
        s1 = (types[i], types[j], types[k], types[l])
        key = min(s1, tuple(reversed(s1)))
        for per, c in P.SIDECHAIN_CHI_CORRECTIONS.get(key, ()):
            # c * cos(n phi) == |c| * (1 + cos(n phi - phase)) - |c|,
            # phase 0 for c>0 and 180 for c<0; the constant is irrelevant
            # to forces and cancels in MH energy differences.
            t_idx.append((i, j, k, l))
            t_k.append(abs(c))
            t_n.append(per)
            t_phase.append(0.0 if c > 0 else _math.pi)

    # Impropers at sp2 centers, replicating OpenMM ForceField's improper
    # matching + 'default' (AMBER) atom ordering exactly: the improper
    # dihedral's axis and sign depend on the atom order, so a different
    # convention changes forces on every sp2 group even when the parameters
    # are identical (openmm/app/forcefield.py _matchImproper workaround).
    adj = [[] for _ in range(V)]
    for i, j in bonds:
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    elements = [a.element for a in topology.atoms]

    for c in range(V):
        if types[c] not in SP2_CENTER_TYPES or len(adj[c]) != 3:
            continue
        nbrs = list(adj[c])  # topology bond order, as OpenMM sees it
        m = P.match_improper(types[c], [types[x] for x in nbrs])
        if m is None:
            continue
        perm, (kk, per, phase) = m
        a1, a2, out = (nbrs[p] for p in perm)
        # AMBER-ordering workaround: carbon first; same element -> lower
        # index first; otherwise heavier element first.
        e1, e2 = elements[a1], elements[a2]
        if e1 == e2:
            if a1 > a2:
                a1, a2 = a2, a1
        elif e1 != "C" and (e2 == "C" or ELEMENT_MASSES[e1] < ELEMENT_MASSES[e2]):
            a1, a2 = a2, a1
        t_idx.append((a1, a2, c, out))
        t_k.append(kk)
        t_n.append(per)
        t_phase.append(phase)

    if strict and missing:
        raise KeyError(f"missing dihedral parameters: {sorted(set(missing))}")

    # Fitted torsion Fourier corrections (see tools/fit_torsions.py):
    # a*cos(n phi) + b*sin(n phi) == k*cos(n phi - gamma) with k=|(a,b)|,
    # gamma=atan2(b, a); represented as a standard periodic term (the
    # constant +k offset has no force and is absorbed by the energy
    # convention offset).
    try:
        from timewarp_tpu.physics.amber.fitted_corrections import (
            TORSION_FOURIER_CORRECTIONS,
        )
    except ImportError:
        TORSION_FOURIER_CORRECTIONS = {}
    if use_fitted_corrections and TORSION_FOURIER_CORRECTIONS:

        for (i, j, k, l) in seen:
            key = canonical_type_key(types, i, j, k, l)
            for (n, a, b) in TORSION_FOURIER_CORRECTIONS.get(key, ()):  # type: ignore
                t_idx.append((i, j, k, l))
                t_k.append(_math.hypot(a, b))
                t_n.append(n)
                t_phase.append(_math.atan2(b, a))

    # Nonbonded.
    lj_sigma = np.zeros(V)
    lj_eps = np.zeros(V)
    for i in range(V):
        lj_sigma[i], lj_eps[i] = P.lj_param(types[i])
    scale_coul, scale_lj = build_scale_matrices(V, bonds, np.array(pairs_14))

    # GB radii/screen. Radii are class-resolved (hybridization for C, bonded
    # heavy atom for H, hydroxyl/ether for O) per the amber99_obc.xml table
    # in params.py; screens are per-element HCT factors.
    gb_radii = np.zeros(V)
    gb_screen = np.zeros(V)
    radii_table = (
        P.GB_RADII_AMBER99OBC if gb_radii_set == "amber99_obc" else P.GB_RADII_MBONDI2
    )
    for a in topology.atoms:
        el = a.element
        t = types[a.index]
        if el == "H":
            bonded = topology.atoms[adj[a.index][0]].element if adj[a.index] else "C"
            key = {"N": "H_on_N", "O": "H_on_O"}.get(bonded, "H")
        elif el == "C":
            key = "C_sp3" if t == "CT" else "C_sp2"
        elif el == "O":
            key = "O_hydroxyl" if t in ("OH", "OS") else "O"
        else:
            key = el
        gb_radii[a.index] = radii_table[key]
        gb_screen[a.index] = P.GB_SCREEN[el]

    masses = np.array([ELEMENT_MASSES[a.element] for a in topology.atoms])

    # NOTE: leaves stay as *numpy* arrays. The system rides into jitted
    # energy functions as captured constants; numpy constants embed directly
    # at trace time, while device (jnp) constants are fetched back from the
    # accelerator during lowering -- ~70s of tunnel round-trips per fresh
    # process for this one function (measured round 2).
    system = AmberSystem(
        masses=np.asarray(masses, np.float32),
        charges=np.asarray(charges, np.float32),
        bond_idx=np.asarray(bonds, np.int32).reshape(-1, 2),
        bond_k=np.asarray(bond_k, np.float32),
        bond_r0=np.asarray(bond_r0, np.float32),
        angle_idx=np.asarray(angle_idx, np.int32).reshape(-1, 3),
        angle_k=np.asarray(angle_k, np.float32),
        angle_theta0=np.asarray(angle_t0, np.float32),
        torsion_idx=np.array(t_idx, dtype=np.int32).reshape(-1, 4),
        torsion_k=np.asarray(t_k, np.float32),
        torsion_n=np.asarray(t_n, np.float32),
        torsion_phase=np.asarray(t_phase, np.float32),
        lj_sigma=np.asarray(lj_sigma, np.float32),
        lj_epsilon=np.asarray(lj_eps, np.float32),
        scale_coul=np.asarray(scale_coul),
        scale_lj=np.asarray(scale_lj),
        gb_radii=np.asarray(gb_radii, np.float32),
        gb_screen=np.asarray(gb_screen, np.float32),
        cutoff=cutoff,
        gb_model=gb_model,
    )
    report = BuildReport(
        total_charge=float(charges.sum()),
        missing_dihedrals=sorted(set(missing)),
        fallback_terminals=fallback_terminals,
    )
    return system, report
