"""Trajectory pair extraction from simulation NPZ archives.

Mirrors the pairing semantics of the reference's ``load_pdb_trace_data``
(reference: dataloader.py:213-276): given a `{name}-traj-arrays.npz` with
`step/positions/velocities/forces` arrays recorded at logarithmically spaced
steps, pair each state at step t with the state at t + step_width, rejecting
pairs with a >100 nm coordinate jump. The logarithmic spacing is inferred
as `largest_interval * 10 // 9` (reference: dataloader.py:236-241).
"""
from __future__ import annotations

import dataclasses
import warnings
from typing import Iterator, List, Optional

import numpy as np

from timewarp_tpu.data.batch import MolDynDatapoint
from timewarp_tpu.data.pdb import Topology, parse_pdb


class CoordDeltaTooBig(Exception):
    def __init__(self, name: str, step1: int, step2: int, delta: float):
        super().__init__(
            f"{name} trajectory has {delta:g} distance between steps {step1} and {step2}"
        )


@dataclasses.dataclass
class TrajectoryData:
    """All (x, y) pairs extracted from one trajectory."""

    name: str
    atom_types: np.ndarray  # [V] int32
    adj_list: np.ndarray  # [E, 2] int32
    coord_features: np.ndarray  # [T, V, 3] f32
    veloc_features: np.ndarray
    force_features: np.ndarray
    coord_targets: np.ndarray
    veloc_targets: np.ndarray
    force_targets: np.ndarray

    @property
    def num_pairs(self) -> int:
        return self.coord_features.shape[0]

    def datapoints(self) -> Iterator[MolDynDatapoint]:
        for t in range(self.num_pairs):
            yield MolDynDatapoint(
                name=self.name,
                atom_types=self.atom_types,
                adj_list=self.adj_list,
                atom_coords=self.coord_features[t],
                atom_velocs=self.veloc_features[t],
                atom_forces=self.force_features[t],
                atom_coord_targets=self.coord_targets[t],
                atom_veloc_targets=self.veloc_targets[t],
                atom_force_targets=self.force_targets[t],
            )


def infer_spacing(steps: np.ndarray) -> int:
    """Infer the base logarithmic spacing from recorded step indices."""
    steps = np.asarray(steps[:100])
    intervals = steps[1:] - steps[:-1]
    largest = int(intervals.max())
    return largest * 10 // 9


def load_trajectory_pairs(
    name: str,
    state0_file: str,
    traj_file: str,
    step_width: int = 1,
    equal_data_spacing: bool = False,
    topology: Optional[Topology] = None,
) -> TrajectoryData:
    topology = topology if topology is not None else parse_pdb(state0_file)
    data = np.load(traj_file)
    steps = np.asarray(data["step"])
    positions = np.asarray(data["positions"], dtype=np.float32)
    velocities = np.asarray(data["velocities"], dtype=np.float32)
    forces = np.asarray(data["forces"], dtype=np.float32)

    step_to_index = {int(s): i for i, s in enumerate(steps)}

    spacing = infer_spacing(steps)
    if spacing <= step_width and not equal_data_spacing:
        warnings.warn(
            f"step_width {step_width} >= data spacing {spacing}: conditioning-target "
            "pairs will be unevenly spaced."
        )

    src_idx: List[int] = []
    dst_idx: List[int] = []
    for step, i in step_to_index.items():
        if equal_data_spacing and step % spacing != 0:
            continue
        j = step_to_index.get(step + step_width)
        if j is None:
            continue
        delta = float(np.sqrt(np.sum((positions[i] - positions[j]) ** 2)))
        if delta > 100.0:
            raise CoordDeltaTooBig(name=name, step1=step, step2=step + step_width, delta=delta)
        src_idx.append(i)
        dst_idx.append(j)

    src = np.array(src_idx, dtype=np.int64)
    dst = np.array(dst_idx, dtype=np.int64)
    return TrajectoryData(
        name=name,
        atom_types=topology.atom_types.astype(np.int32),
        adj_list=topology.bonds.astype(np.int32),
        coord_features=positions[src],
        veloc_features=velocities[src],
        force_features=forces[src],
        coord_targets=positions[dst],
        veloc_targets=velocities[dst],
        force_targets=forces[dst],
    )
