"""Materialize the AD-1-equivalent dataset as standard trajectory files.

Converts a walker NPZ (tools/e2e_alanine.py --save-data) into the
reference's on-disk dataset layout: ``{root}/train`` and ``{root}/val``
subdirectories of ``{name}-traj-state0.pdb`` + ``{name}-traj-arrays.npz``
pairs, one per walker. The reference's AD-1 is ONE 10k-pair trajectory for
train and a second for test (utils/dataset_utils.py:124-130); here the
first ``--val-walkers`` walkers form the held-out split and the rest train.

Usage:
  python tools/make_ad1_dataset.py runs/ad1_proto.npz runs/data_ad1 \
      --val-walkers 4
"""
import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from timewarp_tpu.data.pdb import parse_pdb
from timewarp_tpu.utils.structure_io import write_pdb

AD_PDB = "/root/reference/simulation/testdata/alanine-dipeptide.pdb"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("root")
    ap.add_argument("--val-walkers", type=int, default=4)
    ap.add_argument("--spacing", type=int, default=1000)
    args = ap.parse_args()

    topo = parse_pdb(AD_PDB)
    z = np.load(args.npz)
    coords, velocs = z["coords"], z["velocs"]  # [W, T, V, 3]
    W, T = coords.shape[:2]
    assert args.val_walkers < W

    for w in range(W):
        split = "val" if w < args.val_walkers else "train"
        d = os.path.join(args.root, split)
        os.makedirs(d, exist_ok=True)
        name = f"AD-w{w}"
        write_pdb(os.path.join(d, f"{name}-traj-state0.pdb"), topo, coords[w, 0])
        steps = np.arange(T, dtype=np.int64) * args.spacing
        np.savez_compressed(
            os.path.join(d, f"{name}-traj-arrays.npz"),
            step=steps,
            time=steps * 0.0005,
            positions=coords[w].astype(np.float32),
            velocities=velocs[w].astype(np.float32),
            forces=np.zeros_like(coords[w], dtype=np.float32),
            energies=np.zeros((T, 2), np.float32),
        )
    n_train = (W - args.val_walkers) * (T - 1)
    n_val = args.val_walkers * (T - 1)
    print(f"{args.root}: {W - args.val_walkers} train walkers ({n_train} pairs), "
          f"{args.val_walkers} val walkers ({n_val} pairs)")


if __name__ == "__main__":
    main()
