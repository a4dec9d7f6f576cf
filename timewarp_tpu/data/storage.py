"""Preprocessed trajectory-pair store (the LMDB replacement).

The reference ingests raw NPZ trajectories into sharded LMDB files with
per-shard metadata and cumulative-length global indexing (reference:
datasets/lmdb_dataset.py:21-135, utilities/lmdb_utils.py, preprocess_lmdb.py).
The image has no LMDB, and TPU input pipelines prefer large sequential
reads anyway, so shards are plain ``.npz`` archives, one *group* per
molecule, with a JSON index:

    store/
      metadata.json        {step_width, shards: [{file, pdbs: {name: {...}}}]}
      shard-00000.npz      {"<pdb>/atom_types", "<pdb>/adj_list",
                            "<pdb>/coord_features" [N,V,3], ...}

Ingestion is resumable: already-ingested PDB names are skipped
(reference: preprocess_lmdb.py:54-100).
"""
import dataclasses
import json
import os
from typing import Dict, List

import numpy as np

from timewarp_tpu.data.batch import MolDynDatapoint
from timewarp_tpu.data.trajectory import TrajectoryData

ARRAY_FIELDS = (
    "coord_features",
    "veloc_features",
    "force_features",
    "coord_targets",
    "veloc_targets",
    "force_targets",
)

METADATA_FILE = "metadata.json"


@dataclasses.dataclass
class StoreMetadata:
    step_width: int
    shards: List[dict]  # [{file, pdbs: {name: {num_pairs, num_atoms}}}]

    @property
    def pdb_names(self) -> List[str]:
        names = []
        for s in self.shards:
            names.extend(s["pdbs"].keys())
        return names

    def num_pairs(self, name: str) -> int:
        for s in self.shards:
            if name in s["pdbs"]:
                return s["pdbs"][name]["num_pairs"]
        raise KeyError(name)


class PairStoreWriter:
    """Append TrajectoryData groups into shards of ~shard_size pairs."""

    def __init__(self, root: str, step_width: int, shard_size: int = 50_000):
        self.root = root
        self.step_width = step_width
        self.shard_size = shard_size
        os.makedirs(root, exist_ok=True)
        meta_path = os.path.join(root, METADATA_FILE)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                raw = json.load(f)
            assert raw["step_width"] == step_width, "step_width mismatch with store"
            self.metadata = StoreMetadata(**raw)
        else:
            self.metadata = StoreMetadata(step_width=step_width, shards=[])
        self._pending: Dict[str, TrajectoryData] = {}
        self._pending_pairs = 0

    @property
    def ingested(self) -> set:
        return set(self.metadata.pdb_names)

    def add(self, traj: TrajectoryData):
        if traj.name in self.ingested or traj.name in self._pending:
            return False
        self._pending[traj.name] = traj
        self._pending_pairs += traj.num_pairs
        if self._pending_pairs >= self.shard_size:
            self.flush()
        return True

    def flush(self):
        if not self._pending:
            return
        shard_idx = len(self.metadata.shards)
        fname = f"shard-{shard_idx:05d}.npz"
        arrays = {}
        pdbs = {}
        for name, traj in self._pending.items():
            arrays[f"{name}/atom_types"] = traj.atom_types
            arrays[f"{name}/adj_list"] = traj.adj_list
            for field in ARRAY_FIELDS:
                arrays[f"{name}/{field}"] = getattr(traj, field)
            pdbs[name] = {
                "num_pairs": int(traj.num_pairs),
                "num_atoms": int(traj.atom_types.shape[0]),
            }
        np.savez_compressed(os.path.join(self.root, fname), **arrays)
        self.metadata.shards.append({"file": fname, "pdbs": pdbs})
        self._write_metadata()
        self._pending = {}
        self._pending_pairs = 0

    def _write_metadata(self):
        tmp = os.path.join(self.root, METADATA_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(dataclasses.asdict(self.metadata), f, indent=1)
        os.replace(tmp, os.path.join(self.root, METADATA_FILE))


class PairStore:
    """Map-style reader with (pdb, local_index) and global-index access.

    Shard files are memory-lazy: a shard's arrays load on first touch and
    stay cached (the reference keeps LMDB environments open similarly,
    datasets/lmdb_dataset.py:61-135).
    """

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, METADATA_FILE)) as f:
            self.metadata = StoreMetadata(**json.load(f))
        self._shard_cache: Dict[int, dict] = {}
        self._pdb_to_shard: Dict[str, int] = {}
        for i, s in enumerate(self.metadata.shards):
            for name in s["pdbs"]:
                self._pdb_to_shard[name] = i
        # Cumulative lengths for global indexing.
        self._names: List[str] = []
        self._cumlen = [0]
        for s in self.metadata.shards:
            for name, info in s["pdbs"].items():
                self._names.append(name)
                self._cumlen.append(self._cumlen[-1] + info["num_pairs"])

    def __len__(self) -> int:
        return self._cumlen[-1]

    @property
    def pdb_names(self) -> List[str]:
        return list(self._names)

    def num_pairs(self, name: str) -> int:
        return self.metadata.num_pairs(name)

    def _shard(self, idx: int) -> dict:
        if idx not in self._shard_cache:
            path = os.path.join(self.root, self.metadata.shards[idx]["file"])
            with np.load(path) as z:
                self._shard_cache[idx] = {k: z[k] for k in z.files}
        return self._shard_cache[idx]

    def get(self, name: str, index: int) -> MolDynDatapoint:
        shard = self._shard(self._pdb_to_shard[name])

        def a(field):
            return shard[f"{name}/{field}"]

        return MolDynDatapoint(
            name=name,
            atom_types=a("atom_types"),
            adj_list=a("adj_list"),
            atom_coords=a("coord_features")[index],
            atom_velocs=a("veloc_features")[index],
            atom_forces=a("force_features")[index],
            atom_coord_targets=a("coord_targets")[index],
            atom_veloc_targets=a("veloc_targets")[index],
            atom_force_targets=a("force_targets")[index],
        )

    def __getitem__(self, global_index: int) -> MolDynDatapoint:
        lo, hi = 0, len(self._names)
        import bisect

        i = bisect.bisect_right(self._cumlen, global_index) - 1
        return self.get(self._names[i], global_index - self._cumlen[i])
