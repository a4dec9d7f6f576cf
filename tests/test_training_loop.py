"""Epoch controller, plateau LR, and checkpoint save/restore round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timewarp_tpu.losses import LossConfig, make_loss
from timewarp_tpu.training.checkpoints import Checkpointer, PeriodicCheckpointer
from timewarp_tpu.training.logging import EpochLossTracker, NullLogger
from timewarp_tpu.training.loop import (
    PlateauConfig,
    PlateauController,
    best_valid_loss_controller,
    run_epoch,
    set_plateau_factor,
)
from timewarp_tpu.training.optim import OptimizerConfig, build_optimizer
from timewarp_tpu.training.train_step import TrainState, make_eval_step, make_train_step

from tests.test_training import make_batch, tiny_model, _init_state


def test_plateau_controller_halves_lr():
    c = PlateauController(PlateauConfig(factor=0.5, patience=3, smoothing=0.0))
    for _ in range(4):
        c.update(1.0)  # no improvement
    assert c.factor == 0.5
    for _ in range(8):
        c.update(1.0)
    assert c.factor == 0.125


def test_epoch_controller_and_checkpoints(rng, tmp_path):
    model = tiny_model()
    batch = make_batch(rng, B=4)
    optimizer = build_optimizer(OptimizerConfig(learning_rate=5e-3, warmup_steps=1))
    state = _init_state(model, batch, optimizer)
    loss_fn = make_loss(LossConfig(name="nll", random_velocs=False))
    train_step = make_train_step(model, loss_fn, optimizer, data_augmentation=False, donate=False)
    eval_step = make_eval_step(model, loss_fn)

    ckpt = Checkpointer(str(tmp_path / "ckpts"))
    logger = NullLogger()

    def train_fn(state, rng, epoch):
        return run_epoch(
            train_step, state, [batch] * 4, rng, logger, train=True, epoch=epoch
        )

    def valid_fn(state, rng):
        _, means, _ = run_epoch(eval_step, state, [batch], rng, logger, train=False)
        return means

    state, summary = best_valid_loss_controller(
        state, train_fn, valid_fn, jax.random.PRNGKey(0),
        num_epochs=3, patience=5, checkpointer=ckpt, logger=logger,
    )
    assert summary["best_valid_loss"] < float("inf")
    assert ckpt.exists("best") and ckpt.exists("latest")

    # Restore round-trip: parameters identical.
    template = jax.tree.map(jnp.zeros_like, state)
    restored, epoch = ckpt.restore("latest", template)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_set_plateau_factor_scales_updates(rng):
    model = tiny_model()
    batch = make_batch(rng, B=4)
    optimizer = build_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=1))
    state = _init_state(model, batch, optimizer)
    state2 = set_plateau_factor(state, 0.0)  # freeze

    loss_fn = make_loss(LossConfig(name="nll", random_velocs=False))
    step = make_train_step(model, loss_fn, optimizer, data_augmentation=False, donate=False)
    new_state, _ = step(state2, batch, jax.random.PRNGKey(0))
    # factor 0 -> no parameter change.
    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
