"""Simulation checkpoint/resume.

Reference: simulation/checkpointing.py:22-196 -- the MD engine periodically
writes (positions, velocities, RNG state, step count) atomically so a
preempted trajectory job resumes with the remaining steps. Here the state is
a small NPZ written with atomic rename; the Langevin RNG is a JAX key, so
resume is bit-exact for the remaining schedule.
"""
import dataclasses
import os
import time
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SimCheckpoint:
    coords: np.ndarray  # [W, V, 3]
    velocs: np.ndarray  # [W, V, 3]
    rng_key: np.ndarray  # jax PRNG key data
    frames_done: int
    wall_seconds: float = 0.0


def save_checkpoint(path: str, ckpt: SimCheckpoint):
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        coords=ckpt.coords,
        velocs=ckpt.velocs,
        rng_key=np.asarray(ckpt.rng_key),
        frames_done=np.asarray(ckpt.frames_done),
        wall_seconds=np.asarray(ckpt.wall_seconds),
    )
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[SimCheckpoint]:
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return SimCheckpoint(
        coords=z["coords"],
        velocs=z["velocs"],
        rng_key=z["rng_key"],
        frames_done=int(z["frames_done"]),
        wall_seconds=float(z["wall_seconds"]),
    )


class CheckpointedSimulation:
    """Drive a (vmapped) trajectory in frame chunks with periodic
    checkpointing; resumes from the checkpoint file when present."""

    def __init__(
        self,
        system,
        checkpoint_path: str,
        config=None,
        checkpoint_every_seconds: float = 60.0,
    ):
        from timewarp_tpu.physics.integrator import LangevinConfig

        self.system = system
        self.config = config or LangevinConfig()
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every_seconds = checkpoint_every_seconds

    def run(
        self,
        coords0,
        velocs0,
        rng_key,
        num_frames: int,
        steps_per_frame: int,
        chunk_frames: int = 64,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns ([T, W, V, 3] coords, velocs), resuming when a checkpoint
        exists; frames are reproducible across restarts because each chunk's
        key is folded from the master key by chunk index."""
        import jax

        from timewarp_tpu.physics.integrator import sample_trajectory

        ckpt = load_checkpoint(self.checkpoint_path)
        if ckpt is not None:
            coords = jax.numpy.asarray(ckpt.coords)
            velocs = jax.numpy.asarray(ckpt.velocs)
            frames_done = ckpt.frames_done
        else:
            coords, velocs = coords0, velocs0
            frames_done = 0

        W = coords.shape[0]
        run_chunk = jax.jit(
            jax.vmap(
                lambda c, v, k: sample_trajectory(
                    self.system, c, v, k, chunk_frames, steps_per_frame, self.config
                )
            )
        )

        frames_c, frames_v = [], []
        last_save = time.time()
        chunk_idx = frames_done // chunk_frames
        while frames_done < num_frames:
            keys = jax.vmap(
                lambda w: jax.random.fold_in(
                    jax.random.fold_in(rng_key, int(chunk_idx)), w
                )
            )(jax.numpy.arange(W))
            tc, tv = run_chunk(coords, velocs, keys)
            coords, velocs = tc[:, -1], tv[:, -1]
            take = min(chunk_frames, num_frames - frames_done)
            frames_c.append(np.asarray(tc[:, :take]))
            frames_v.append(np.asarray(tv[:, :take]))
            frames_done += take
            chunk_idx += 1
            if time.time() - last_save > self.checkpoint_every_seconds:
                save_checkpoint(
                    self.checkpoint_path,
                    SimCheckpoint(
                        coords=np.asarray(coords),
                        velocs=np.asarray(velocs),
                        rng_key=np.asarray(rng_key),
                        frames_done=frames_done,
                    ),
                )
                last_save = time.time()

        save_checkpoint(
            self.checkpoint_path,
            SimCheckpoint(
                coords=np.asarray(coords),
                velocs=np.asarray(velocs),
                rng_key=np.asarray(rng_key),
                frames_done=frames_done,
            ),
        )
        return (
            np.concatenate(frames_c, axis=1),
            np.concatenate(frames_v, axis=1),
        )
