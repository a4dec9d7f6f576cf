"""Self-contained PDB topology parser.

The runtime image has no mdtraj/openmm, so this module replaces the
reference's ``md.load(state0_file).topology`` (reference: dataloader.py:222)
with a small parser that recovers exactly what the framework needs:

- per-atom element -> vocabulary index
- residue structure (for AMBER parameterization, physics/amber)
- bond adjacency list: heavy-atom bonds from residue templates
  (data/residues.py), peptide bonds between consecutive residues, OXT->C,
  and hydrogens attached to their nearest heavy atom in the state0 geometry.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from timewarp_tpu.data.elements import ELEMENT_VOCAB
from timewarp_tpu.data.residues import RESIDUE_BONDS, CAP_RESIDUES


@dataclasses.dataclass
class Atom:
    index: int
    name: str
    element: str
    residue_index: int


@dataclasses.dataclass
class Residue:
    index: int
    name: str
    chain_id: str
    resseq: int
    atom_indices: List[int]


@dataclasses.dataclass
class Topology:
    atoms: List[Atom]
    residues: List[Residue]
    bonds: np.ndarray  # [E, 2] int32, i < j
    positions: np.ndarray  # [V, 3] float32 in nm (from the PDB file)

    @property
    def num_atoms(self) -> int:
        return len(self.atoms)

    @property
    def atom_types(self) -> np.ndarray:
        """[V] int32 element-vocabulary ids (C,H,N,O,S -> 0..4)."""
        return np.array([ELEMENT_VOCAB[a.element] for a in self.atoms], dtype=np.int32)

    def atom_index(self, residue: Residue, name: str) -> Optional[int]:
        for i in residue.atom_indices:
            if self.atoms[i].name == name:
                return i
        return None


def _infer_element(name: str, element_field: str) -> str:
    e = element_field.strip()
    if e:
        e = e[0].upper() + e[1:].lower()
        if e in ELEMENT_VOCAB:
            return e
    # Fall back to the atom name: strip digits, first letter wins for
    # biopolymer C/H/N/O/S atoms ("1HB" -> H, "CA" -> C, "OXT" -> O).
    stripped = name.strip().lstrip("0123456789")
    first = stripped[:1].upper()
    if first in ELEMENT_VOCAB:
        return first
    raise ValueError(f"Cannot infer element for atom name {name!r}")


def parse_pdb(path: str) -> Topology:
    """Parse the first model of a PDB file into a Topology."""
    atoms: List[Atom] = []
    residues: List[Residue] = []
    positions: List[Tuple[float, float, float]] = []

    current_key = None
    with open(path) as f:
        for line in f:
            record = line[:6]
            if record in ("ENDMDL", "END   ") or line.startswith("ENDMDL"):
                break
            if record not in ("ATOM  ", "HETATM"):
                continue
            name = line[12:16].strip()
            resname = line[17:20].strip() or line[17:21].strip()
            chain_id = line[21]
            resseq = line[22:26].strip()
            resseq = int(resseq) if resseq else 0
            x = float(line[30:38])
            y = float(line[38:46])
            z = float(line[46:54])
            element_field = line[76:78] if len(line) >= 78 else ""

            key = (chain_id, resseq, resname)
            if key != current_key:
                residues.append(
                    Residue(
                        index=len(residues),
                        name=resname,
                        chain_id=chain_id,
                        resseq=resseq,
                        atom_indices=[],
                    )
                )
                current_key = key

            atom = Atom(
                index=len(atoms),
                name=name,
                element=_infer_element(name, element_field),
                residue_index=len(residues) - 1,
            )
            residues[-1].atom_indices.append(atom.index)
            atoms.append(atom)
            # PDB coordinates are Angstrom; trajectory data is nm.
            positions.append((x / 10.0, y / 10.0, z / 10.0))

    pos = np.asarray(positions, dtype=np.float32)
    bonds = _derive_bonds(atoms, residues, pos)
    return Topology(atoms=atoms, residues=residues, bonds=bonds, positions=pos)


def _derive_bonds(atoms: List[Atom], residues: List[Residue], pos: np.ndarray) -> np.ndarray:
    name_of = {(a.residue_index, a.name): a.index for a in atoms}
    bonds = set()

    def add(i: Optional[int], j: Optional[int]):
        if i is None or j is None:
            return
        bonds.add((min(i, j), max(i, j)))

    for res in residues:
        template = RESIDUE_BONDS.get(res.name)
        if template is None and res.name not in RESIDUE_BONDS:
            raise ValueError(f"Unknown residue {res.name!r}; add it to residues.py")
        for a_name, b_name in template or []:
            add(name_of.get((res.index, a_name)), name_of.get((res.index, b_name)))
        # C-terminal carboxylate.
        add(name_of.get((res.index, "C")), name_of.get((res.index, "OXT")))

    # Peptide bonds between consecutive residues in the same chain.
    for prev, nxt in zip(residues[:-1], residues[1:]):
        if prev.chain_id != nxt.chain_id:
            continue
        c = name_of.get((prev.index, "C"))
        n = name_of.get((nxt.index, "N"))
        if n is None and nxt.name in CAP_RESIDUES:
            # NHE cap stores its nitrogen under various names; try generic N.
            for cand in ("N", "NT"):
                n = name_of.get((nxt.index, cand))
                if n is not None:
                    break
        add(c, n)

    # Attach each hydrogen to its nearest heavy atom within the same residue
    # (falling back to global nearest if the residue has no heavy atoms).
    heavy = np.array([a.index for a in atoms if a.element != "H"], dtype=np.int64)
    for a in atoms:
        if a.element != "H":
            continue
        res_heavy = np.array(
            [i for i in residues[a.residue_index].atom_indices if atoms[i].element != "H"],
            dtype=np.int64,
        )
        cands = res_heavy if res_heavy.size else heavy
        d = np.linalg.norm(pos[cands] - pos[a.index], axis=-1)
        add(a.index, int(cands[int(np.argmin(d))]))

    if not bonds:
        return np.zeros((0, 2), dtype=np.int32)
    return np.array(sorted(bonds), dtype=np.int32)
