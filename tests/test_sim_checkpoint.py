"""Simulation checkpoint/resume: interrupted runs produce identical
trajectories to uninterrupted ones."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from timewarp_tpu.physics.diatomic import make_o2_system
from timewarp_tpu.physics.integrator import maxwell_boltzmann_velocities
from timewarp_tpu.physics.sim_checkpoint import (
    CheckpointedSimulation,
    load_checkpoint,
    save_checkpoint,
)


def test_checkpoint_resume_bit_exact(tmp_path):
    system = make_o2_system()
    W = 2
    coords0 = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0], [0.121, 0.0, 0.0]])[None], (W, 1, 1))
    velocs0 = jax.vmap(lambda k: maxwell_boltzmann_velocities(system, k))(
        jax.random.split(jax.random.PRNGKey(0), W)
    )
    key = jax.random.PRNGKey(7)

    # Uninterrupted run.
    p1 = str(tmp_path / "a.npz")
    sim1 = CheckpointedSimulation(system, p1, checkpoint_every_seconds=1e9)
    c_full, v_full = sim1.run(coords0, velocs0, key, num_frames=8, steps_per_frame=5, chunk_frames=4)
    assert c_full.shape == (W, 8, 2, 3)

    # Interrupted run: first 4 frames, checkpoint, then a NEW simulation
    # object resumes the remaining 4.
    p2 = str(tmp_path / "b.npz")
    sim2 = CheckpointedSimulation(system, p2, checkpoint_every_seconds=1e9)
    c_a, v_a = sim2.run(coords0, velocs0, key, num_frames=4, steps_per_frame=5, chunk_frames=4)
    assert load_checkpoint(p2).frames_done == 4

    sim3 = CheckpointedSimulation(system, p2, checkpoint_every_seconds=1e9)
    c_b, v_b = sim3.run(coords0, velocs0, key, num_frames=8, steps_per_frame=5, chunk_frames=4)
    # Resumed tail matches the uninterrupted run exactly.
    np.testing.assert_allclose(c_b, c_full[:, 4:], atol=1e-6)
