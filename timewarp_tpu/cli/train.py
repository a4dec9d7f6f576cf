"""Training CLI.

Usage: python -m timewarp_tpu.cli.train <config.yaml> [key=value ...]

Mirrors the reference's entry point (reference: train.py:289-324): YAML
config + dotlist overrides, resumable output folder, best-valid epoch
controller. Data parallelism is automatic over all visible devices.
"""
import argparse
import json
import os

import jax
import numpy as np

from timewarp_tpu.config import TrainingConfig, load_config, save_config
from timewarp_tpu.data.batch import collate_dense
from timewarp_tpu.data.datasets import TrajectoryIterableDataset
from timewarp_tpu.data.registry import get_raw_dataset
from timewarp_tpu.losses import make_loss
from timewarp_tpu.models.constructor import build_model
from timewarp_tpu.parallel.mesh import make_mesh, shard_batch
from timewarp_tpu.training.checkpoints import Checkpointer, PeriodicCheckpointer
from timewarp_tpu.training.logging import (
    LeaderOnlyLogger,
    PeriodicLogger,
    TensorBoardLogger,
)
from timewarp_tpu.training.loop import best_valid_loss_controller, run_epoch
from timewarp_tpu.training.optim import build_optimizer
from timewarp_tpu.training.train_step import TrainState, make_eval_step, make_train_step


def batches_from_dataset(dataset, config: TrainingConfig, mesh=None):
    """Collate streaming datapoints into (optionally sharded) DenseBatches.

    Multi-process: each host collates batch_size/process_count datapoints
    (its molecule shard) and shard_batch assembles the global batch --
    global batch size stays config.batch_size regardless of world size
    (the reference's train_micro_batch_size_per_gpu = batch/world,
    train_deepspeed.py:99-120)."""
    per_host = max(config.batch_size // jax.process_count(), 1)
    buf = []
    for dp in dataset:
        buf.append(dp)
        if len(buf) == per_host:
            batch = collate_dense(buf)
            yield shard_batch(mesh, batch) if mesh is not None else batch
            buf = []


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="YAML config path")
    parser.add_argument("overrides", nargs="*", help="dotlist overrides key=value")
    args = parser.parse_args(argv)

    config = load_config(args.config, args.overrides)

    # Multi-host SPMD: one process per host, all chips in one global mesh
    # (TPU-native replacement for deepspeed.init_distributed(), reference:
    # train_deepspeed.py:68-120). Coordinator/process env comes from the TPU
    # runtime; on a single host this is a no-op flag.
    if config.distributed:
        jax.distributed.initialize()

    if config.randomise_seed:
        config.seed = int(np.random.default_rng().integers(0, 2**31))
        if config.distributed and jax.process_count() > 1:
            # Leader decides, everyone follows (reference:
            # utilities/deepspeed_utils.py:75-101 broadcast_from_leader).
            from jax.experimental import multihost_utils

            config.seed = int(
                multihost_utils.broadcast_one_to_all(np.int32(config.seed))
            )

    run_name = f"{config.run_prefix}{config.model_config.model_type}_{config.dataset}"
    out_dir = os.path.join(config.output_folder, run_name)
    os.makedirs(out_dir, exist_ok=True)
    save_config(config, os.path.join(out_dir, "config.yaml"))

    # Data. Separate train/val splits when the dataset directory has
    # train/ + val/ (or test/) subdirs; flat fixture dirs serve both
    # (reference: utils/dataset_utils.py:103-140 per-split file lists).
    raw_train = get_raw_dataset(
        config.dataset, data_dir=config.data_dir, step_width=config.step_width,
        split="train",
    )
    raw_valid = get_raw_dataset(
        config.dataset, data_dir=config.data_dir, step_width=config.step_width,
        split="val",
    )
    if raw_train.data_dir == raw_valid.data_dir:
        print("note: no train/val split subdirs; validating on training data")
    # Per-host molecule shard (strided by protein, reference:
    # datasets/pdb_sampler.py:126); single-process runs see everything.
    shard = dict(num_replicas=jax.process_count(), rank=jax.process_index())
    train_ds = TrajectoryIterableDataset(raw_train, shuffle=True, seed=config.seed, **shard)
    valid_ds = TrajectoryIterableDataset(raw_valid, shuffle=False, seed=config.seed, **shard)

    # Model/optimizer.
    model = build_model(config.model_config)
    first = next(iter(batches_from_dataset(train_ds, config)))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(config.seed),
        first.atom_types,
        first.atom_coords,
        first.atom_velocs,
        first.atom_coord_targets,
        first.atom_veloc_targets,
        first.masked_elements,
    )
    optimizer = build_optimizer(config.optimizer_config())
    state = TrainState.create(params, optimizer)

    mesh = make_mesh() if jax.device_count() > 1 else None
    loss_fn = make_loss(config.loss)
    train_step = make_train_step(
        model, loss_fn, optimizer, mesh=mesh,
        data_augmentation=config.data_augmentation,
    )
    eval_step = make_eval_step(model, loss_fn, mesh=mesh)

    logger = LeaderOnlyLogger(PeriodicLogger(TensorBoardLogger(out_dir)))
    ckpt = Checkpointer(out_dir)
    periodic = PeriodicCheckpointer(ckpt, config.min_check_point_iters)

    if config.saved_model_path and str(config.saved_model_path).endswith(".pkl"):
        # Warm start from pickled params (e.g. a tools/e2e_alanine.py
        # checkpoint); optimizer state starts fresh (the reference's
        # warm_start loads module weights only, train_deepspeed.py:148-158).
        import pickle

        with open(config.saved_model_path, "rb") as f:
            params = jax.device_put(pickle.load(f))
        state = TrainState.create(params, optimizer)
        print(f"warm start from {config.saved_model_path}")
    elif config.saved_model_path or ckpt.exists("latest"):
        try:
            state, epoch0 = ckpt.restore("latest", state)
            print(f"resumed from epoch {epoch0}")
        except Exception as e:  # fresh run
            print(f"no restorable checkpoint ({e}); starting fresh")

    def train_fn(state, rng, epoch):
        train_ds.set_epoch(epoch)
        return run_epoch(
            train_step, state, batches_from_dataset(train_ds, config, mesh), rng,
            logger, train=True, checkpointer=periodic, epoch=epoch,
        )

    def valid_fn(state, rng):
        _, means, _ = run_epoch(
            eval_step, state, batches_from_dataset(valid_ds, config, mesh), rng,
            logger, train=False,
        )
        return means

    state, summary = best_valid_loss_controller(
        state,
        train_fn,
        valid_fn,
        jax.random.PRNGKey(config.seed + 1),
        num_epochs=config.num_epochs,
        patience=config.patience,
        checkpointer=ckpt,
        logger=logger,
        run_valid_first=config.run_valid_first,
    )
    with open(os.path.join(out_dir, "best_validation_loss.json"), "w") as f:
        json.dump(summary, f)
    print("training done:", summary)


if __name__ == "__main__":
    main()
