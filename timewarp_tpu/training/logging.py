"""Training metrics logging with device-friendly batched flushing.

Reference: utilities/logger.py:13-155 + utilities/delayed_reporter.py --
scalars accumulate as device arrays and flush to TensorBoard in batches so
the train loop never forces a per-step device->host sync. In JAX the same
effect falls out of async dispatch: metric arrays are held as jax.Arrays
and only converted to floats at flush time.
"""
import abc
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class TrainingLogger(abc.ABC):
    """step-counted scalar logger (reference: utilities/logger.py:13-66)."""

    def __init__(self):
        self._step = 0
        self._pending: List[Tuple[str, object, int]] = []

    def increment_step(self):
        self._step += 1
        if len(self._pending) >= 128:
            self.flush()

    @property
    def step(self) -> int:
        return self._step

    def log_scalar(self, name: str, value, flush: bool = False):
        self._pending.append((name, value, self._step))
        if flush:
            self.flush()

    # async variant kept for API parity -- JAX values are already futures.
    log_scalar_async = log_scalar

    def flush(self):
        pending, self._pending = self._pending, []
        for name, value, step in pending:
            self._write(name, float(np.asarray(value)), step)

    @abc.abstractmethod
    def _write(self, name: str, value: float, step: int):
        ...


class NullLogger(TrainingLogger):
    def log_scalar(self, name, value, flush=False):
        pass

    log_scalar_async = log_scalar

    def _write(self, name, value, step):
        pass


class TensorBoardLogger(TrainingLogger):
    def __init__(self, logdir: str):
        super().__init__()
        from tensorboardX import SummaryWriter

        os.makedirs(logdir, exist_ok=True)
        self.writer = SummaryWriter(logdir)

    def _write(self, name, value, step):
        self.writer.add_scalar(name, value, step)

    def flush(self):
        super().flush()
        self.writer.flush()


class PeriodicLogger(TrainingLogger):
    """Forward only every ``period`` steps, with always-logged exceptions
    (reference: utilities/logger.py PeriodicLogger, period 100)."""

    def __init__(self, inner: TrainingLogger, period: int = 100,
                 always: Sequence[str] = ("valid", "throughput", "best")):
        super().__init__()
        self.inner = inner
        self.period = period
        self.always = tuple(always)

    def increment_step(self):
        super().increment_step()
        self.inner.increment_step()

    def log_scalar(self, name, value, flush=False):
        if self._step % self.period == 0 or any(a in name for a in self.always):
            self.inner.log_scalar(name, value, flush)

    log_scalar_async = log_scalar

    def _write(self, name, value, step):
        pass

    def flush(self):
        self.inner.flush()


class LeaderOnlyLogger(TrainingLogger):
    """Log only on process 0 (reference: utilities/logger.py LeaderOnlyLogger)."""

    def __init__(self, inner: TrainingLogger, process_index: Optional[int] = None):
        super().__init__()
        if process_index is None:
            import jax

            process_index = jax.process_index()
        self.inner = inner if process_index == 0 else NullLogger()

    def increment_step(self):
        super().increment_step()
        self.inner.increment_step()

    def log_scalar(self, name, value, flush=False):
        self.inner.log_scalar(name, value, flush)

    log_scalar_async = log_scalar

    def _write(self, name, value, step):
        pass

    def flush(self):
        self.inner.flush()


class EpochLossTracker:
    """On-device loss accumulation without per-step .item() syncs
    (reference: utilities/training_utils.py:67-164)."""

    def __init__(self):
        self._values: Dict[str, list] = {}
        self._count = 0

    def update(self, metrics: Dict[str, object]):
        for k, v in metrics.items():
            self._values.setdefault(k, []).append(v)  # jax.Arrays, no sync
        self._count += 1

    @property
    def count(self) -> int:
        return self._count

    def means(self) -> Dict[str, float]:
        return {
            k: float(np.mean([float(np.asarray(v)) for v in vals]))
            for k, vals in self._values.items()
        }
