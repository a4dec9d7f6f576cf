from timewarp_tpu.data.elements import KNOWN_ELEMENTS, ELEMENT_VOCAB, ELEMENT_MASSES
from timewarp_tpu.data.batch import (
    MolDynDatapoint,
    DenseBatch,
    collate_dense,
    lengths_to_mask,
    contiguous_segments,
)
from timewarp_tpu.data.pdb import parse_pdb, Topology
from timewarp_tpu.data.trajectory import load_trajectory_pairs, TrajectoryData

__all__ = [
    "KNOWN_ELEMENTS",
    "ELEMENT_VOCAB",
    "ELEMENT_MASSES",
    "MolDynDatapoint",
    "DenseBatch",
    "collate_dense",
    "lengths_to_mask",
    "contiguous_segments",
    "parse_pdb",
    "Topology",
    "load_trajectory_pairs",
    "TrajectoryData",
]
