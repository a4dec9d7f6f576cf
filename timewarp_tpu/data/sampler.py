"""Distributed sampler that shards *molecules* across hosts.

Reference semantics (datasets/pdb_sampler.py:19-217): each rank gets a
strided subset of PDB names (not indices), so per-batch energy evaluations
amortize per-molecule setup; ``max_contiguous_length`` bounds how many
consecutive samples come from the same molecule (controls within-batch
diversity); ``set_epoch`` reshuffles deterministically.

On TPU this feeds the per-host input pipeline: rank = jax.process_index(),
num_replicas = jax.process_count().
"""
import random
from typing import Iterator, List, Optional

import numpy as np


class MoleculeShardedSampler:
    def __init__(
        self,
        pdb_names: List[str],
        num_pairs_per_pdb: List[int],
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        max_contiguous_length: Optional[int] = None,
    ):
        assert 0 <= rank < num_replicas
        self.pdb_names = list(pdb_names)
        self.num_pairs = list(num_pairs_per_pdb)
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.max_contiguous_length = max_contiguous_length
        self._epoch = 0

        # Cumulative offsets into the global index space.
        self._offsets = np.concatenate([[0], np.cumsum(self.num_pairs)])

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    @property
    def local_pdb_names(self) -> List[str]:
        """Strided shard of molecules for this rank."""
        return self.pdb_names[self.rank :: self.num_replicas]

    def __iter__(self) -> Iterator[int]:
        rng = random.Random(f"{self.seed}-{self._epoch}")
        local = list(range(self.rank, len(self.pdb_names), self.num_replicas))
        if self.shuffle:
            rng.shuffle(local)

        # Build per-molecule index runs, chunked to max_contiguous_length.
        chunks: List[List[int]] = []
        for p in local:
            idxs = list(range(self._offsets[p], self._offsets[p + 1]))
            if self.shuffle:
                rng.shuffle(idxs)
            step = self.max_contiguous_length or len(idxs) or 1
            for s in range(0, len(idxs), step):
                chunks.append(idxs[s : s + step])
        if self.shuffle:
            rng.shuffle(chunks)
        for chunk in chunks:
            yield from chunk

    def __len__(self) -> int:
        return sum(
            self.num_pairs[p]
            for p in range(self.rank, len(self.pdb_names), self.num_replicas)
        )
