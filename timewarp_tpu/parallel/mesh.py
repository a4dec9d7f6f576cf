"""Device-mesh helpers for SPMD training.

The reference scales with DeepSpeed data parallelism over NCCL
(reference: train_deepspeed.py:68-120, SURVEY.md section 2.7). The TPU-native
equivalent is a single ``jax.sharding.Mesh`` over all chips with the batch
sharded on a ``data`` axis; XLA emits the gradient ``psum`` over ICI
automatically when the jitted loss averages over the global batch.
Optimizer-state sharding (ZeRO-1 analogue) lives in training/optim.py.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a DenseBatch (or any pytree of [B, ...] arrays) with the batch
    axis sharded over the mesh. B must divide the mesh size.

    Single process: ``batch`` is the global batch, device_put sharded.
    Multi-process: ``batch`` is THIS HOST'S slice of the global batch (the
    input pipeline shards molecules by process, cli/train.py); the global
    array is assembled from the per-process locals -- the jitted step then
    sees one global batch and XLA emits the cross-host gradient psum
    (gloo on CPU, ICI/DCN on TPU). Reference equivalent: DeepSpeed's
    train_micro_batch_size_per_gpu = batch/world (train_deepspeed.py:99-120).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
