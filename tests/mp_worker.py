"""Worker for the 2-process data-parallel test (tests/test_multiprocess.py).

Run as: python tests/mp_worker.py <process_id> <num_processes> <port>
With num_processes=0: single-process reference run on the same GLOBAL batch.

Prints one line per step: `LOSS <step> <value>`.
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax

jax.config.update("jax_platforms", "cpu")
if nproc > 0:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timewarp_tpu.data.batch import MolDynDatapoint, collate_dense
from timewarp_tpu.losses import LossConfig, make_loss
from timewarp_tpu.models.constructor import (
    CustomAttentionTransformerNVPConfig,
    ModelConfig,
    build_model,
)
from timewarp_tpu.models.layers.custom_encoder import CustomAttentionEncoderConfig
from timewarp_tpu.parallel.mesh import make_mesh, shard_batch
from timewarp_tpu.training.optim import OptimizerConfig, build_optimizer
from timewarp_tpu.training.train_step import TrainState, make_train_step

GLOBAL_B = 4


def make_global_points():
    rng = np.random.default_rng(0)
    pts = []
    for i in range(GLOBAL_B):
        n = 5
        coords = rng.normal(size=(n, 3)).astype(np.float32)
        pts.append(
            MolDynDatapoint(
                name=f"m{i}",
                atom_types=rng.integers(0, 5, size=(n,)).astype(np.int32),
                adj_list=np.array([[j, j + 1] for j in range(n - 1)], np.int32),
                atom_coords=coords,
                atom_velocs=rng.normal(size=(n, 3)).astype(np.float32),
                atom_forces=np.zeros((n, 3), np.float32),
                atom_coord_targets=coords + 0.01,
                atom_veloc_targets=rng.normal(size=(n, 3)).astype(np.float32),
                atom_force_targets=np.zeros((n, 3), np.float32),
            )
        )
    return pts


def main():
    pts = make_global_points()
    if nproc > 0:
        # This host's slice of the global batch (deterministic split).
        per = GLOBAL_B // nproc
        local = pts[pid * per : (pid + 1) * per]
    else:
        local = pts

    model = build_model(
        ModelConfig(
            model_type="custom_attention_transformer_nvp",
            custom_transformer_nvp_config=CustomAttentionTransformerNVPConfig(
                atom_embedding_dim=8,
                latent_mlp_hidden_dims=(16,),
                num_coupling_layers=2,
                num_transformer_layers=1,
                encoder_layer_config=CustomAttentionEncoderConfig(
                    d_model=16, dim_feedforward=32, num_heads=2,
                    attention_type="kernel", lengthscales=[0.5, 1.0],
                ),
            ),
        )
    )
    mesh = make_mesh()
    batch = shard_batch(mesh, collate_dense(local))

    init_batch = collate_dense(pts)  # identical params everywhere
    params = model.init(
        jax.random.PRNGKey(0), init_batch.atom_types, init_batch.atom_coords,
        init_batch.atom_velocs, init_batch.atom_coord_targets,
        init_batch.atom_veloc_targets, init_batch.masked_elements,
    )
    optimizer = build_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=1))
    state = TrainState.create(params, optimizer)
    loss_fn = make_loss(LossConfig(name="nll", random_velocs=True))
    step = make_train_step(
        model, loss_fn, optimizer, mesh=mesh, data_augmentation=False, zero1=True
    )
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        print(f"LOSS {i} {float(metrics['loss']):.6f}", flush=True)


if __name__ == "__main__":
    main()
