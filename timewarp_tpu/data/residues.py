"""Heavy-atom connectivity templates for standard protein residues.

Used to derive bond adjacency lists from PDB topology without external
dependencies (the reference delegates this to mdtraj's residue templates,
reference: dataloader.py:223-224). Hydrogens are not listed here -- they are
attached to their nearest heavy atom geometrically (PDB hydrogen naming is
too inconsistent across generators to template reliably).

Each entry maps residue name -> list of (atom_name, atom_name) heavy-atom
bonds *within* the residue. The backbone peptide bond C(i)-N(i+1) and the
C-terminal C-OXT bond are added by the parser.
"""

_BACKBONE = [("N", "CA"), ("CA", "C"), ("C", "O")]

RESIDUE_BONDS = {
    "ALA": _BACKBONE + [("CA", "CB")],
    "ARG": _BACKBONE
    + [
        ("CA", "CB"),
        ("CB", "CG"),
        ("CG", "CD"),
        ("CD", "NE"),
        ("NE", "CZ"),
        ("CZ", "NH1"),
        ("CZ", "NH2"),
    ],
    "ASN": _BACKBONE + [("CA", "CB"), ("CB", "CG"), ("CG", "OD1"), ("CG", "ND2")],
    "ASP": _BACKBONE + [("CA", "CB"), ("CB", "CG"), ("CG", "OD1"), ("CG", "OD2")],
    "CYS": _BACKBONE + [("CA", "CB"), ("CB", "SG")],
    "GLN": _BACKBONE
    + [("CA", "CB"), ("CB", "CG"), ("CG", "CD"), ("CD", "OE1"), ("CD", "NE2")],
    "GLU": _BACKBONE
    + [("CA", "CB"), ("CB", "CG"), ("CG", "CD"), ("CD", "OE1"), ("CD", "OE2")],
    "GLY": _BACKBONE,
    "HIS": _BACKBONE
    + [
        ("CA", "CB"),
        ("CB", "CG"),
        ("CG", "ND1"),
        ("CG", "CD2"),
        ("ND1", "CE1"),
        ("CD2", "NE2"),
        ("CE1", "NE2"),
    ],
    "ILE": _BACKBONE + [("CA", "CB"), ("CB", "CG1"), ("CB", "CG2"), ("CG1", "CD1")],
    "LEU": _BACKBONE + [("CA", "CB"), ("CB", "CG"), ("CG", "CD1"), ("CG", "CD2")],
    "LYS": _BACKBONE
    + [("CA", "CB"), ("CB", "CG"), ("CG", "CD"), ("CD", "CE"), ("CE", "NZ")],
    "MET": _BACKBONE + [("CA", "CB"), ("CB", "CG"), ("CG", "SD"), ("SD", "CE")],
    "PHE": _BACKBONE
    + [
        ("CA", "CB"),
        ("CB", "CG"),
        ("CG", "CD1"),
        ("CG", "CD2"),
        ("CD1", "CE1"),
        ("CD2", "CE2"),
        ("CE1", "CZ"),
        ("CE2", "CZ"),
    ],
    "PRO": _BACKBONE + [("CA", "CB"), ("CB", "CG"), ("CG", "CD"), ("CD", "N")],
    "SER": _BACKBONE + [("CA", "CB"), ("CB", "OG")],
    "THR": _BACKBONE + [("CA", "CB"), ("CB", "OG1"), ("CB", "CG2")],
    "TRP": _BACKBONE
    + [
        ("CA", "CB"),
        ("CB", "CG"),
        ("CG", "CD1"),
        ("CG", "CD2"),
        ("CD1", "NE1"),
        ("NE1", "CE2"),
        ("CD2", "CE2"),
        ("CD2", "CE3"),
        ("CE2", "CZ2"),
        ("CE3", "CZ3"),
        ("CZ2", "CH2"),
        ("CZ3", "CH2"),
    ],
    "TYR": _BACKBONE
    + [
        ("CA", "CB"),
        ("CB", "CG"),
        ("CG", "CD1"),
        ("CG", "CD2"),
        ("CD1", "CE1"),
        ("CD2", "CE2"),
        ("CE1", "CZ"),
        ("CE2", "CZ"),
        ("CZ", "OH"),
    ],
    "VAL": _BACKBONE + [("CA", "CB"), ("CB", "CG1"), ("CB", "CG2")],
    # Histidine protonation variants share HIS connectivity.
    "HIE": None,
    "HID": None,
    "HIP": None,
    # Caps.
    "ACE": [("CH3", "C"), ("C", "O")],
    "NME": [("N", "CH3")],
    "NHE": [],  # single N amide cap; bond to previous C added by parser
}
RESIDUE_BONDS["HIE"] = RESIDUE_BONDS["HIS"]
RESIDUE_BONDS["HID"] = RESIDUE_BONDS["HIS"]
RESIDUE_BONDS["HIP"] = RESIDUE_BONDS["HIS"]

# Residues that terminate a chain on the N side (no incoming peptide bond).
CAP_RESIDUES = {"ACE", "NME", "NHE"}
