"""Named dataset registry.

The reference maps dataset names to Azure blob paths with expected
file/point counts for cache validation (reference: utils/dataset_utils.py:103-337).
This deployment has no blob egress, so entries resolve to local directories
(raw trajectory dirs or preprocessed PairStores) plus the same validation
counts; `simulated:` entries are generated on demand with the pure-JAX
Langevin engine (the TPU-native replacement for the reference's Amulet
simulation fan-out).
"""
import dataclasses
import os
from typing import Dict, Optional

from timewarp_tpu.data.datasets import RawMolDynDataset


@dataclasses.dataclass
class DatasetSpec:
    name: str
    step_width: int
    description: str = ""
    # Local raw-trajectory directory (state0.pdb + arrays.npz pairs).
    raw_dir: Optional[str] = None
    # Preprocessed PairStore directory.
    store_dir: Optional[str] = None
    # Source PDB to simulate when no data exists.
    simulate_pdb: Optional[str] = None
    expected_files: Optional[int] = None


REFERENCE_TESTDATA = "/root/reference/testdata/output"
SIM_TESTDATA = "/root/reference/simulation/testdata"

REGISTRY: Dict[str, DatasetSpec] = {
    # Tiny on-disk fixtures from the reference checkout (test datasets).
    "test": DatasetSpec(
        name="test",
        step_width=1_000_000,
        raw_dir=REFERENCE_TESTDATA,
        description="2 mini-trajectories (2olx 65 atoms, 1hgv 691 atoms)",
        expected_files=2,
    ),
    # AD-1: alanine dipeptide, step_width 1000. The published dataset lives
    # in private blob storage; here it is generated on demand with the JAX
    # Langevin engine (tools/e2e_alanine.py recipe).
    "AD-1": DatasetSpec(
        name="AD-1",
        step_width=1000,
        simulate_pdb=os.path.join(SIM_TESTDATA, "alanine-dipeptide.pdb"),
        description="alanine dipeptide, 10k pairs @ step_width 1000",
    ),
    # AD-1-JAX: the locally generated AD-1 equivalent with a real held-out
    # split (train/ + val/ walker trajectories). Generate with
    # tools/e2e_alanine.py --save-data + tools/make_ad1_dataset.py.
    "AD-1-JAX": DatasetSpec(
        name="AD-1-JAX",
        step_width=1000,
        raw_dir="runs/data_ad1",
        description="alanine dipeptide walkers, 10k train pairs @ step_width "
                    "1000 + held-out val walkers (self-generated)",
    ),
    # 2AA-JAX: the self-generated analogue of the reference's 2AA-1
    # transferable-dipeptide regime (reference: utils/dataset_utils.py:
    # 199-206 -- ~1,500 trajectory files of random dipeptides). Generated
    # locally by tools/e2e_2aa.py (template peptide builder + FIRE
    # minimization + vmapped Langevin walkers); one state0.pdb +
    # arrays.npz per dipeptide, in-walker pairs only.
    "2AA-JAX": DatasetSpec(
        name="2AA-JAX",
        step_width=1000,
        raw_dir="runs/data_2aa14",
        description="random uncapped dipeptides under the amber14-implicit "
                    "preset (the reference's 2AA mapping; ff14SB-torsion gap "
                    "disclosed in physics/presets.py), train/ + val/ split on "
                    "disk (generate via: python tools/e2e_2aa.py --gen-only)",
    ),
    # Round-3 legacy 2AA data: flat directory, amber99 defaults, split known
    # only to tools/e2e_2aa.py's in-process lists. Kept for reproducibility
    # of runs/report_2aa.json; superseded by 2AA-JAX.
    "2AA-JAX-legacy": DatasetSpec(
        name="2AA-JAX-legacy",
        step_width=1000,
        raw_dir="runs/data_2aa",
        description="round-3 2AA data (amber99-implicit defaults, no on-disk "
                    "split); superseded by 2AA-JAX",
    ),
    # 4AA-JAX: same recipe at tetrapeptide length (reference 4AA-*,
    # utils/dataset_utils.py:199-206).
    "4AA-JAX": DatasetSpec(
        name="4AA-JAX",
        step_width=1000,
        raw_dir="runs/data_4aa",
        description="random uncapped tetrapeptides, amber14-implicit preset, "
                    "train/ + val/ split on disk (generate via: "
                    "python tools/e2e_2aa.py --aa-length 4 "
                    "--data-dir runs/data_4aa --gen-only)",
    ),
}


def get_dataset_spec(name: str) -> DatasetSpec:
    if name not in REGISTRY:
        raise KeyError(
            f"unknown dataset {name!r}; known: {sorted(REGISTRY)}. Register "
            "local data via DatasetSpec(raw_dir=...) or data_dir config."
        )
    return REGISTRY[name]


def _split_dir(base: str, split: Optional[str]) -> str:
    """Resolve a split subdirectory (train/val/test) when present.

    Reference datasets ship separate train/val/test file lists
    (utils/dataset_utils.py:103-140); locally that is a ``{raw_dir}/train``
    + ``{raw_dir}/val`` layout. Flat directories serve every split (legacy
    fixtures like the reference testdata)."""
    if split is None:
        return base
    cand = os.path.join(base, split)
    if os.path.isdir(cand):
        return cand
    # "val" falls back to "test" (the reference's AD-1 has train+test only,
    # and train.py validates on the test trajectory in that case).
    if split == "val":
        cand = os.path.join(base, "test")
        if os.path.isdir(cand):
            return cand
    return base


def get_raw_dataset(
    name: str,
    data_dir: Optional[str] = None,
    step_width: Optional[int] = None,
    split: Optional[str] = None,
) -> RawMolDynDataset:
    """Resolve a named dataset (or explicit directory) to a raw dataset."""
    if data_dir is not None:
        assert step_width is not None, "explicit data_dir needs step_width"
        return RawMolDynDataset(_split_dir(data_dir, split), step_width=step_width)
    spec = get_dataset_spec(name)
    if spec.raw_dir is None:
        raise FileNotFoundError(
            f"dataset {name!r} has no local raw data; generate it first "
            "(cli/simulate.py) or pass data_dir."
        )
    ds = RawMolDynDataset(_split_dir(spec.raw_dir, split), step_width=spec.step_width)
    if spec.expected_files is not None and len(ds.pdb_names) != spec.expected_files:
        raise RuntimeError(
            f"dataset {name!r}: expected {spec.expected_files} trajectories, "
            f"found {len(ds.pdb_names)}"
        )
    return ds
