"""Preprocess raw trajectory dirs into a sharded PairStore
(reference: preprocess_lmdb.py:54-100 -- resumable, skips ingested PDBs).

Usage: python -m timewarp_tpu.cli.preprocess <raw_dir> <store_dir> --step-width N
"""
import argparse

from timewarp_tpu.data.datasets import RawMolDynDataset
from timewarp_tpu.data.storage import PairStoreWriter


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("raw_dir")
    ap.add_argument("store_dir")
    ap.add_argument("--step-width", type=int, required=True)
    ap.add_argument("--shard-size", type=int, default=50_000)
    ap.add_argument("--equal-data-spacing", action="store_true")
    args = ap.parse_args(argv)

    raw = RawMolDynDataset(
        args.raw_dir, step_width=args.step_width, equal_data_spacing=args.equal_data_spacing
    )
    writer = PairStoreWriter(args.store_dir, args.step_width, args.shard_size)
    skipped, added = 0, 0
    for name in raw.pdb_names:
        if name in writer.ingested:
            skipped += 1
            continue
        traj = raw.load(name)
        writer.add(traj)
        added += 1
        print(f"ingested {name}: {traj.num_pairs} pairs")
    writer.flush()
    print(f"done: {added} added, {skipped} already present")


if __name__ == "__main__":
    main()
