"""Atom-element vocabulary shared across the framework.

Mirrors the 5-element vocabulary of the reference implementation
(reference: dataloader.py:24-25) -- peptides only contain C,H,N,O,S.
"""

KNOWN_ELEMENTS = ["C", "H", "N", "O", "S"]
ELEMENT_VOCAB = {e: i for i, e in enumerate(KNOWN_ELEMENTS)}

# Standard atomic masses in dalton (g/mol). Used for kinetic energies when
# velocities are physical (nm/ps); with `random_velocs` training the model
# works with unit-variance velocities and masses cancel.
ELEMENT_MASSES = {
    "C": 12.011,
    "H": 1.008,
    "N": 14.007,
    "O": 15.999,
    "S": 32.06,
}
