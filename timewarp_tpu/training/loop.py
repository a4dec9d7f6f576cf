"""Training loop: epoch driver with best-valid tracking, patience early
stopping, periodic checkpoints, and an optional loss-plateau LR controller.

Reference: train.py:64-171 (train_loop), utils/training_utils.py:70-188
(run_on_dataloader), utilities/training_utils.py:214-277
(best_valid_loss_controller), utils/deepspeed_lr_scheduler.py:52-141
(PlateauLR -- realized here as a host-side multiplicative factor written
into the optimizer's injected ``plateau_factor`` hyperparameter).
"""
import dataclasses
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from timewarp_tpu.training.checkpoints import Checkpointer, PeriodicCheckpointer
from timewarp_tpu.training.logging import EpochLossTracker, NullLogger, TrainingLogger
from timewarp_tpu.training.train_step import TrainState


@dataclasses.dataclass
class PlateauConfig:
    """Multiply LR by ``factor`` when the smoothed loss hasn't improved for
    ``patience`` optimizer steps."""

    factor: float = 0.5
    patience: int = 2000
    smoothing: float = 0.99
    min_factor: float = 1e-3


class PlateauController:
    def __init__(self, config: PlateauConfig):
        self.config = config
        self.best = float("inf")
        self.smoothed = None
        self.since_best = 0
        self.factor = 1.0

    def update(self, loss: float) -> float:
        c = self.config
        self.smoothed = (
            loss
            if self.smoothed is None
            else c.smoothing * self.smoothed + (1 - c.smoothing) * loss
        )
        if self.smoothed < self.best - 1e-6:
            self.best = self.smoothed
            self.since_best = 0
        else:
            self.since_best += 1
            if self.since_best >= c.patience:
                self.factor = max(self.factor * c.factor, c.min_factor)
                self.since_best = 0
        return self.factor


def set_plateau_factor(state: TrainState, factor: float) -> TrainState:
    """Write the factor into the optimizer's injected hyperparameter leaf."""

    opt_state = state.opt_state
    new_opt_state = []
    changed = False
    for part in opt_state:
        hp = getattr(part, "hyperparams", None)
        if isinstance(hp, dict) and "plateau_factor" in hp:
            hp = dict(hp)
            hp["plateau_factor"] = jax.numpy.asarray(factor, dtype=jax.numpy.float32)
            part = part._replace(hyperparams=hp)
            changed = True
        new_opt_state.append(part)
    if not changed:
        return state
    return dataclasses.replace(state, opt_state=tuple(new_opt_state))


def run_epoch(
    step_fn: Callable,
    state: TrainState,
    batches: Iterable,
    rng: jax.Array,
    logger: TrainingLogger,
    train: bool = True,
    plateau: Optional[PlateauController] = None,
    checkpointer: Optional[PeriodicCheckpointer] = None,
    epoch: int = 0,
) -> tuple:
    """One pass over the data. In eval mode ``step_fn`` is an eval step
    returning metrics only."""
    tracker = EpochLossTracker()
    t0 = time.time()
    n = 0
    for i, batch in enumerate(batches):
        rng, k = jax.random.split(rng)
        if train:
            state, metrics = step_fn(state, batch, k)
        else:
            metrics = step_fn(state.params, batch, k)
        tracker.update(metrics)
        n += batch.batch_size
        logger.increment_step()
        for name, v in metrics.items():
            logger.log_scalar_async(("" if train else "valid_") + name, v)
        if train and plateau is not None:
            # NOTE: feeding the controller forces a device sync; plateau
            # scheduling trades a per-step sync for LR adaptivity (the
            # reference's PlateauLR does the same, deepspeed_lr_scheduler.py).
            plateau.update(float(np.asarray(metrics["loss"])))
            state = set_plateau_factor(state, plateau.factor)
        if train and checkpointer is not None:
            checkpointer.maybe_save(int(np.asarray(state.step)), state, epoch)
    dt = time.time() - t0
    means = tracker.means()
    if tracker.count:
        logger.log_scalar_async("throughput_samples_per_s", n / dt)
    logger.flush()
    return state, means, rng


def best_valid_loss_controller(
    state: TrainState,
    train_fn: Callable,  # (state, rng, epoch) -> (state, means, rng)
    valid_fn: Callable,  # (state, rng) -> means
    rng: jax.Array,
    num_epochs: int,
    patience: int,
    checkpointer: Optional[Checkpointer] = None,
    logger: Optional[TrainingLogger] = None,
    run_valid_first: bool = True,
) -> tuple:
    """Epoch driver: keep the best-validation state, stop after ``patience``
    epochs without improvement (reference: utilities/training_utils.py:214-277)."""
    logger = logger or NullLogger()
    best_loss = float("inf")
    best_epoch = -1
    since_best = 0

    if run_valid_first:
        rng, k = jax.random.split(rng)
        means = valid_fn(state, k)
        best_loss = means.get("loss", float("inf"))
        logger.log_scalar_async("valid_loss_initial", best_loss, flush=True)

    for epoch in range(num_epochs):
        state, train_means, rng = train_fn(state, rng, epoch)
        rng, k = jax.random.split(rng)
        valid_means = valid_fn(state, k)
        v = valid_means.get("loss", float("inf"))
        logger.log_scalar_async("valid_loss", v)
        logger.log_scalar_async("train_loss_epoch", train_means.get("loss", np.nan), flush=True)

        if v < best_loss:
            best_loss, best_epoch, since_best = v, epoch, 0
            if checkpointer is not None:
                checkpointer.save("best", state, epoch, extra={"valid_loss": v})
        else:
            since_best += 1
            if since_best >= patience:
                break
        if checkpointer is not None:
            checkpointer.save("latest", state, epoch)

    return state, {"best_valid_loss": best_loss, "best_epoch": best_epoch}
