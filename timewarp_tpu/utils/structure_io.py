"""Structure writing for visualization.

Reference: visualise/visualise.py (PyMOL renderings + PDB writer). PyMOL is
not in the image; multi-model PDB output feeds any external viewer, and the
XYZ writer covers quick inspection.
"""
import numpy as np

from timewarp_tpu.data.pdb import Topology


def write_pdb(
    path: str,
    topology: Topology,
    coords: np.ndarray,  # [T, V, 3] or [V, 3], nm
    max_models: int = 100,
):
    """Write a (multi-model) PDB; coordinates converted nm -> Angstrom."""
    coords = np.asarray(coords)
    if coords.ndim == 2:
        coords = coords[None]
    coords = coords[:max_models]
    with open(path, "w") as f:
        for m, frame in enumerate(coords):
            f.write(f"MODEL     {m + 1:4d}\n")
            for atom in topology.atoms:
                res = topology.residues[atom.residue_index]
                x, y, z = frame[atom.index] * 10.0
                name = atom.name if len(atom.name) >= 4 else f" {atom.name:<3s}"
                f.write(
                    f"ATOM  {atom.index + 1:5d} {name:<4s}{res.name:>4s} "
                    f"{res.chain_id}{res.resseq:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00          "
                    f"{atom.element:>2s}\n"
                )
            f.write("ENDMDL\n")
        f.write("END\n")


def write_xyz(path: str, topology: Topology, coords: np.ndarray):
    coords = np.asarray(coords)
    if coords.ndim == 2:
        coords = coords[None]
    with open(path, "w") as f:
        for frame in coords:
            f.write(f"{topology.num_atoms}\n\n")
            for atom in topology.atoms:
                x, y, z = frame[atom.index] * 10.0
                f.write(f"{atom.element} {x:.4f} {y:.4f} {z:.4f}\n")
