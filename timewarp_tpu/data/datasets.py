"""Dataset iterators over raw trajectory files and preprocessed stores.

Counterparts of the reference's dataset layer
(reference: datasets/iterable_datasets.py:46-279, datasets/lmdb_dataset.py):

- ``RawMolDynDataset``: lazy iteration over `{name}-traj-state0.pdb` /
  `{name}-traj-arrays.npz` pairs in a directory.
- ``TrajectoryIterableDataset``: streaming pairs with chunked shuffling
  (``num_traces_per_chunk`` trajectories mixed per shuffle buffer).
- ``PairDataset``: map-style view over a preprocessed PairStore.

These are plain-Python host-side iterators; the TPU boundary is the dense
collation (data/batch.py).
"""
import os
import random
from typing import Iterator, List, Optional, Sequence


from timewarp_tpu.data.batch import MolDynDatapoint, collate_dense
from timewarp_tpu.data.storage import PairStore
from timewarp_tpu.data.trajectory import TrajectoryData, load_trajectory_pairs


def find_trajectory_files(data_dir: str) -> List[str]:
    """PDB names with both state0 and arrays files present."""
    names = []
    for f in sorted(os.listdir(data_dir)):
        if f.endswith("-traj-state0.pdb"):
            name = f[: -len("-traj-state0.pdb")]
            if os.path.exists(os.path.join(data_dir, f"{name}-traj-arrays.npz")):
                names.append(name)
    return names


class RawMolDynDataset:
    """Lazy per-trajectory loader (reference: datasets/iterable_datasets.py:46-129)."""

    def __init__(self, data_dir: str, step_width: int, equal_data_spacing: bool = False):
        self.data_dir = data_dir
        self.step_width = step_width
        self.equal_data_spacing = equal_data_spacing
        self.pdb_names = find_trajectory_files(data_dir)

    def load(self, name: str) -> TrajectoryData:
        return load_trajectory_pairs(
            name,
            os.path.join(self.data_dir, f"{name}-traj-state0.pdb"),
            os.path.join(self.data_dir, f"{name}-traj-arrays.npz"),
            step_width=self.step_width,
            equal_data_spacing=self.equal_data_spacing,
        )

    def make_iterator(self, names: Optional[Sequence[str]] = None) -> Iterator[TrajectoryData]:
        for name in names or self.pdb_names:
            yield self.load(name)


class TrajectoryIterableDataset:
    """Streaming datapoints with chunked shuffling: load
    ``num_traces_per_chunk`` trajectories, shuffle their pairs together,
    yield, repeat (reference: datasets/iterable_datasets.py:172-279)."""

    def __init__(
        self,
        raw: RawMolDynDataset,
        shuffle: bool = True,
        num_traces_per_chunk: int = 4,
        seed: int = 0,
        num_replicas: int = 1,
        rank: int = 0,
    ):
        """``(num_replicas, rank)`` shard the *molecules* across hosts the
        way the reference's LMDBDistributedSampler does (reference:
        datasets/pdb_sampler.py:19-217): rank r reads every
        num_replicas-th protein, so shards are disjoint and cover all data.
        On TPU multi-host: rank = jax.process_index(),
        num_replicas = jax.process_count()."""
        assert 0 <= rank < num_replicas
        self.raw = raw
        self.shuffle = shuffle
        self.num_traces_per_chunk = num_traces_per_chunk
        self.seed = seed
        self.num_replicas = num_replicas
        self.rank = rank
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __iter__(self) -> Iterator[MolDynDatapoint]:
        rng = random.Random(f"{self.seed}-{self._epoch}")
        names = list(self.raw.pdb_names)
        if self.shuffle:
            rng.shuffle(names)
        if self.num_replicas > 1:
            # Shard AFTER the epoch shuffle so every epoch deals each rank a
            # different (but globally disjoint, seed-synchronized) subset.
            names = names[self.rank :: self.num_replicas]
        for c in range(0, len(names), self.num_traces_per_chunk):
            chunk = names[c : c + self.num_traces_per_chunk]
            points: List[MolDynDatapoint] = []
            for name in chunk:
                points.extend(self.raw.load(name).datapoints())
            if self.shuffle:
                rng.shuffle(points)
            yield from points


class PairDataset:
    """Map-style dataset over a preprocessed store."""

    def __init__(self, store: PairStore):
        self.store = store

    def __len__(self):
        return len(self.store)

    def __getitem__(self, idx: int) -> MolDynDatapoint:
        return self.store[idx]

    @property
    def pdb_names(self):
        return self.store.pdb_names


def batch_iterator(
    dataset,
    indices: Iterator[int],
    batch_size: int,
    pad_multiple: int = 8,
    max_atoms: Optional[int] = None,
    drop_last: bool = True,
):
    """Collate index batches from a map-style dataset into DenseBatches."""
    buf = []
    for i in indices:
        buf.append(dataset[i])
        if len(buf) == batch_size:
            yield collate_dense(buf, pad_multiple=pad_multiple, max_atoms=max_atoms)
            buf = []
    if buf and not drop_last:
        yield collate_dense(buf, pad_multiple=pad_multiple, max_atoms=max_atoms)
