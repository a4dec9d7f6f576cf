"""AMBER ff94/ff99 residue templates: atom name -> (atom type, charge).

These are the Cornell et al. charges used unchanged by ff99/ff99SB/ff99SBildn
(the force field behind the reference's legacy "amber99-implicit" preset,
reference: simulation/md.py:151-152). The tables are embedded because the
runtime image has no OpenMM/AmberTools to read them from.

Hydrogen naming is normalized at build time (``normalize_h_name``): PDB v2
("1HB2") and v3 ("HB21") variants map onto the canonical names used here.

Terminal residues: ``NXXX`` (protonated N-terminus, N->N3 with 3 H) and
``CXXX`` (deprotonated C-terminus with OXT, O->O2) override the mid-chain
charges where a table is provided; otherwise ``make_terminal_fallback``
adjusts types and places the residual integer charge on the terminal
heavy atom (documented approximation, flagged in the build report).
"""
from typing import Dict, Tuple

# type aliases
T = Tuple[str, float]  # (amber type, charge)

BACKBONE = {
    "N": ("N", -0.4157),
    "H": ("H", 0.2719),
    "C": ("C", 0.5973),
    "O": ("O", -0.5679),
}

# Charged-side-chain residues use a different backbone charge set.
BACKBONE_NEG = {  # ASP, GLU
    "N": ("N", -0.5163),
    "H": ("H", 0.2936),
    "C": ("C", 0.5366),
    "O": ("O", -0.5819),
}
BACKBONE_POS = {  # LYS, ARG
    "N": ("N", -0.3479),
    "H": ("H", 0.2747),
    "C": ("C", 0.7341),
    "O": ("O", -0.5894),
}


def _res(backbone, **atoms) -> Dict[str, T]:
    out = dict(backbone)
    out.update(atoms)
    return out


RESIDUES: Dict[str, Dict[str, T]] = {
    "ALA": _res(
        BACKBONE,
        CA=("CT", 0.0337), HA=("H1", 0.0823),
        CB=("CT", -0.1825), HB1=("HC", 0.0603), HB2=("HC", 0.0603), HB3=("HC", 0.0603),
    ),
    "GLY": _res(
        BACKBONE,
        CA=("CT", -0.0252), HA2=("H1", 0.0698), HA3=("H1", 0.0698),
    ),
    "SER": _res(
        BACKBONE,
        CA=("CT", -0.0249), HA=("H1", 0.0843),
        CB=("CT", 0.2117), HB2=("H1", 0.0352), HB3=("H1", 0.0352),
        OG=("OH", -0.6546), HG=("HO", 0.4275),
    ),
    "THR": _res(
        BACKBONE,
        CA=("CT", -0.0389), HA=("H1", 0.1007),
        CB=("CT", 0.3654), HB=("H1", 0.0043),
        OG1=("OH", -0.6761), HG1=("HO", 0.4102),
        CG2=("CT", -0.2438), HG21=("HC", 0.0642), HG22=("HC", 0.0642), HG23=("HC", 0.0642),
    ),
    "CYS": _res(
        BACKBONE,
        CA=("CT", 0.0213), HA=("H1", 0.1124),
        CB=("CT", -0.1231), HB2=("H1", 0.1112), HB3=("H1", 0.1112),
        SG=("SH", -0.3119), HG=("HS", 0.1933),
    ),
    "VAL": _res(
        BACKBONE,
        CA=("CT", -0.0875), HA=("H1", 0.0969),
        CB=("CT", 0.2985), HB=("HC", -0.0297),
        CG1=("CT", -0.3192), HG11=("HC", 0.0791), HG12=("HC", 0.0791), HG13=("HC", 0.0791),
        CG2=("CT", -0.3192), HG21=("HC", 0.0791), HG22=("HC", 0.0791), HG23=("HC", 0.0791),
    ),
    "LEU": _res(
        BACKBONE,
        CA=("CT", -0.0518), HA=("H1", 0.0922),
        CB=("CT", -0.1102), HB2=("HC", 0.0457), HB3=("HC", 0.0457),
        CG=("CT", 0.3531), HG=("HC", -0.0361),
        CD1=("CT", -0.4121), HD11=("HC", 0.1000), HD12=("HC", 0.1000), HD13=("HC", 0.1000),
        CD2=("CT", -0.4121), HD21=("HC", 0.1000), HD22=("HC", 0.1000), HD23=("HC", 0.1000),
    ),
    "ILE": _res(
        BACKBONE,
        CA=("CT", -0.0597), HA=("H1", 0.0869),
        CB=("CT", 0.1303), HB=("HC", 0.0187),
        CG2=("CT", -0.3204), HG21=("HC", 0.0882), HG22=("HC", 0.0882), HG23=("HC", 0.0882),
        CG1=("CT", -0.0430), HG12=("HC", 0.0236), HG13=("HC", 0.0236),
        CD1=("CT", -0.0660), HD11=("HC", 0.0186), HD12=("HC", 0.0186), HD13=("HC", 0.0186),
    ),
    "MET": _res(
        BACKBONE,
        CA=("CT", -0.0237), HA=("H1", 0.0880),
        CB=("CT", 0.0342), HB2=("HC", 0.0241), HB3=("HC", 0.0241),
        CG=("CT", 0.0018), HG2=("H1", 0.0440), HG3=("H1", 0.0440),
        SD=("S", -0.2737),
        CE=("CT", -0.0536), HE1=("H1", 0.0684), HE2=("H1", 0.0684), HE3=("H1", 0.0684),
    ),
    "PHE": _res(
        BACKBONE,
        CA=("CT", -0.0024), HA=("H1", 0.0978),
        CB=("CT", -0.0343), HB2=("HC", 0.0295), HB3=("HC", 0.0295),
        CG=("CA", 0.0118),
        CD1=("CA", -0.1256), HD1=("HA", 0.1330),
        CD2=("CA", -0.1256), HD2=("HA", 0.1330),
        CE1=("CA", -0.1704), HE1=("HA", 0.1430),
        CE2=("CA", -0.1704), HE2=("HA", 0.1430),
        CZ=("CA", -0.1072), HZ=("HA", 0.1297),
    ),
    "TYR": _res(
        BACKBONE,
        CA=("CT", -0.0014), HA=("H1", 0.0876),
        CB=("CT", -0.0152), HB2=("HC", 0.0295), HB3=("HC", 0.0295),
        CG=("CA", -0.0011),
        CD1=("CA", -0.1906), HD1=("HA", 0.1699),
        CD2=("CA", -0.1906), HD2=("HA", 0.1699),
        CE1=("CA", -0.2341), HE1=("HA", 0.1656),
        CE2=("CA", -0.2341), HE2=("HA", 0.1656),
        CZ=("C", 0.3226), OH=("OH", -0.5579), HH=("HO", 0.3992),
    ),
    "TRP": _res(
        BACKBONE,
        CA=("CT", -0.0275), HA=("H1", 0.1123),
        CB=("CT", -0.0050), HB2=("HC", 0.0339), HB3=("HC", 0.0339),
        CG=("C*", -0.1415),
        CD1=("CW", -0.1638), HD1=("H4", 0.2062),
        NE1=("NA", -0.3418), HE1=("H", 0.3412),
        CE2=("CN", 0.1380),
        CZ2=("CA", -0.2601), HZ2=("HA", 0.1572),
        CH2=("CA", -0.1134), HH2=("HA", 0.1417),
        CZ3=("CA", -0.1972), HZ3=("HA", 0.1447),
        CE3=("CA", -0.2387), HE3=("HA", 0.1700),
        CD2=("CB", 0.1243),
    ),
    "ASN": _res(
        BACKBONE,
        CA=("CT", 0.0143), HA=("H1", 0.1048),
        CB=("CT", -0.2041), HB2=("HC", 0.0797), HB3=("HC", 0.0797),
        CG=("C", 0.7130), OD1=("O", -0.5931),
        ND2=("N", -0.9191), HD21=("H", 0.4196), HD22=("H", 0.4196),
    ),
    "GLN": _res(
        BACKBONE,
        CA=("CT", -0.0031), HA=("H1", 0.0850),
        CB=("CT", -0.0036), HB2=("HC", 0.0171), HB3=("HC", 0.0171),
        CG=("CT", -0.0645), HG2=("HC", 0.0352), HG3=("HC", 0.0352),
        CD=("C", 0.6951), OE1=("O", -0.6086),
        NE2=("N", -0.9407), HE21=("H", 0.4251), HE22=("H", 0.4251),
    ),
    "ASP": _res(
        BACKBONE_NEG,
        CA=("CT", 0.0381), HA=("H1", 0.0880),
        CB=("CT", -0.0303), HB2=("HC", -0.0122), HB3=("HC", -0.0122),
        CG=("C", 0.7994), OD1=("O2", -0.8014), OD2=("O2", -0.8014),
    ),
    "GLU": _res(
        BACKBONE_NEG,
        CA=("CT", 0.0397), HA=("H1", 0.1105),
        CB=("CT", 0.0560), HB2=("HC", -0.0173), HB3=("HC", -0.0173),
        CG=("CT", 0.0136), HG2=("HC", -0.0425), HG3=("HC", -0.0425),
        CD=("C", 0.8054), OE1=("O2", -0.8188), OE2=("O2", -0.8188),
    ),
    "LYS": _res(
        BACKBONE_POS,
        CA=("CT", -0.2400), HA=("H1", 0.1426),
        CB=("CT", -0.0094), HB2=("HC", 0.0362), HB3=("HC", 0.0362),
        CG=("CT", 0.0187), HG2=("HC", 0.0103), HG3=("HC", 0.0103),
        CD=("CT", -0.0479), HD2=("HC", 0.0621), HD3=("HC", 0.0621),
        CE=("CT", -0.0143), HE2=("HP", 0.1135), HE3=("HP", 0.1135),
        NZ=("N3", -0.3854), HZ1=("H", 0.3400), HZ2=("H", 0.3400), HZ3=("H", 0.3400),
    ),
    "ARG": _res(
        BACKBONE_POS,
        CA=("CT", -0.2637), HA=("H1", 0.1560),
        CB=("CT", -0.0007), HB2=("HC", 0.0327), HB3=("HC", 0.0327),
        CG=("CT", 0.0390), HG2=("HC", 0.0285), HG3=("HC", 0.0285),
        CD=("CT", 0.0486), HD2=("H1", 0.0687), HD3=("H1", 0.0687),
        NE=("N2", -0.5295), HE=("H", 0.3456),
        CZ=("CA", 0.8076),
        NH1=("N2", -0.8627), HH11=("H", 0.4478), HH12=("H", 0.4478),
        NH2=("N2", -0.8627), HH21=("H", 0.4478), HH22=("H", 0.4478),
    ),
    "HIE": _res(
        BACKBONE,
        CA=("CT", -0.0581), HA=("H1", 0.1360),
        CB=("CT", -0.0074), HB2=("HC", 0.0367), HB3=("HC", 0.0367),
        CG=("CC", 0.1868),
        ND1=("NB", -0.5432),
        CE1=("CR", 0.1635), HE1=("H5", 0.1435),
        NE2=("NA", -0.2795), HE2=("H", 0.3339),
        CD2=("CW", -0.2207), HD2=("H4", 0.1862),
    ),
    "HID": _res(
        BACKBONE,
        CA=("CT", 0.0188), HA=("H1", 0.0881),
        CB=("CT", -0.0462), HB2=("HC", 0.0402), HB3=("HC", 0.0402),
        CG=("CC", -0.0266),
        ND1=("NA", -0.3811), HD1=("H", 0.3649),
        CE1=("CR", 0.2057), HE1=("H5", 0.1392),
        NE2=("NB", -0.5727),
        CD2=("CV", 0.1292), HD2=("H4", 0.1147),
    ),
    "HIP": _res(
        {"N": ("N", -0.3479), "H": ("H", 0.2747), "C": ("C", 0.7341), "O": ("O", -0.5894)},
        CA=("CT", -0.1354), HA=("H1", 0.1212),
        CB=("CT", -0.0414), HB2=("HC", 0.0810), HB3=("HC", 0.0810),
        CG=("CC", -0.0012),
        ND1=("NA", -0.1513), HD1=("H", 0.3866),
        CE1=("CR", -0.0170), HE1=("H5", 0.2681),
        NE2=("NA", -0.1718), HE2=("H", 0.3911),
        CD2=("CW", -0.1141), HD2=("H4", 0.2317),
    ),
    "PRO": _res(
        {"N": ("N", -0.2548), "C": ("C", 0.5896), "O": ("O", -0.5748)},
        CD=("CT", 0.0192), HD2=("H1", 0.0391), HD3=("H1", 0.0391),
        CG=("CT", 0.0189), HG2=("HC", 0.0213), HG3=("HC", 0.0213),
        CB=("CT", -0.0070), HB2=("HC", 0.0253), HB3=("HC", 0.0253),
        CA=("CT", -0.0266), HA=("H1", 0.0641),
    ),
    # Caps.
    "ACE": {
        "HH31": ("HC", 0.1123), "HH32": ("HC", 0.1123), "HH33": ("HC", 0.1123),
        "CH3": ("CT", -0.3662), "C": ("C", 0.5972), "O": ("O", -0.5679),
    },
    "NME": {
        "N": ("N", -0.4157), "H": ("H", 0.2719),
        "CH3": ("CT", -0.1490),
        "HH31": ("H1", 0.0976), "HH32": ("H1", 0.0976), "HH33": ("H1", 0.0976),
    },
    "NHE": {"N": ("N", -0.4630), "HN1": ("H", 0.2315), "HN2": ("H", 0.2315)},
}
RESIDUES["HIS"] = RESIDUES["HIE"]  # default protonation


# Explicit terminal-variant charge tables where known.
N_TERMINAL: Dict[str, Dict[str, T]] = {
    "ALA": {
        "N": ("N3", 0.1414), "H1": ("H", 0.1997), "H2": ("H", 0.1997), "H3": ("H", 0.1997),
        "CA": ("CT", 0.0962), "HA": ("HP", 0.0889),
        "CB": ("CT", -0.0597), "HB1": ("HC", 0.0300), "HB2": ("HC", 0.0300), "HB3": ("HC", 0.0300),
        "C": ("C", 0.6163), "O": ("O", -0.5722),
    },
    "ASN": {
        "N": ("N3", 0.1801), "H1": ("H", 0.1921), "H2": ("H", 0.1921), "H3": ("H", 0.1921),
        "CA": ("CT", 0.0368), "HA": ("HP", 0.1231),
        "CB": ("CT", -0.0283), "HB2": ("HC", 0.0515), "HB3": ("HC", 0.0515),
        "CG": ("C", 0.5833), "OD1": ("O", -0.5744),
        "ND2": ("N", -0.8634), "HD21": ("H", 0.4097), "HD22": ("H", 0.4097),
        "C": ("C", 0.6163), "O": ("O", -0.5722),
    },
    "GLY": {
        "N": ("N3", 0.2943), "H1": ("H", 0.1642), "H2": ("H", 0.1642), "H3": ("H", 0.1642),
        "CA": ("CT", -0.0100), "HA2": ("HP", 0.0895), "HA3": ("HP", 0.0895),
        "C": ("C", 0.6163), "O": ("O", -0.5722),
    },
}

C_TERMINAL: Dict[str, Dict[str, T]] = {
    "ALA": {
        "N": ("N", -0.3821), "H": ("H", 0.2681),
        "CA": ("CT", -0.1747), "HA": ("H1", 0.1067),
        "CB": ("CT", -0.2093), "HB1": ("HC", 0.0764), "HB2": ("HC", 0.0764), "HB3": ("HC", 0.0764),
        "C": ("C", 0.7731), "O": ("O2", -0.8055), "OXT": ("O2", -0.8055),
    },
    "GLN": {
        "N": ("N", -0.3821), "H": ("H", 0.2681),
        "CA": ("CT", -0.2248), "HA": ("H1", 0.1232),
        # CB is negative in all_aminoct94 (a + sign here previously made the
        # residue sum -0.867 instead of -1; the renormalizer smeared the
        # 0.133e error over all 17 atoms).
        "CB": ("CT", -0.0664), "HB2": ("HC", 0.0452), "HB3": ("HC", 0.0452),
        "CG": ("CT", -0.0210), "HG2": ("HC", 0.0203), "HG3": ("HC", 0.0203),
        "CD": ("C", 0.7093), "OE1": ("O", -0.6098),
        "NE2": ("N", -0.9574), "HE21": ("H", 0.4304), "HE22": ("H", 0.4304),
        "C": ("C", 0.7775), "O": ("O2", -0.8042), "OXT": ("O2", -0.8042),
    },
    "GLY": {
        "N": ("N", -0.3821), "H": ("H", 0.2681),
        "CA": ("CT", -0.2493), "HA2": ("H1", 0.1056), "HA3": ("H1", 0.1056),
        "C": ("C", 0.7231), "O": ("O2", -0.7855), "OXT": ("O2", -0.7855),
    },
}


def normalize_h_name(name: str) -> str:
    """Map PDB-v2 style hydrogen names to the canonical v3 names used in the
    templates: '1HB' -> 'HB1', '2HH3' -> 'HH32'."""
    if name and name[0].isdigit():
        return name[1:] + name[0]
    return name
