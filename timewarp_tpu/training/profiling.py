"""Profiling hooks.

Reference: utilities/training_utils.py:170-197 (torch.profiler around the
epoch-0 dataloader) and profile.py (standalone sampling/memory profiles).
TPU equivalents: jax.profiler traces viewable in TensorBoard/XProf, plus
device memory statistics.
"""
import contextlib
import time
from typing import Iterable, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profiled_iterable(
    iterable: Iterable,
    logdir: str,
    wait: int = 1,
    warmup: int = 1,
    active: int = 4,
) -> Iterator:
    """Wrap a batch iterator so steps [wait+warmup, wait+warmup+active) are
    traced (the reference's schedule semantics)."""
    start = wait + warmup
    stop = start + active
    tracing = False
    for i, item in enumerate(iterable):
        if i == start:
            jax.profiler.start_trace(logdir)
            tracing = True
        if i == stop and tracing:
            jax.profiler.stop_trace()
            tracing = False
        yield item
    if tracing:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device memory statistics (bytes) where the backend reports them."""
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats


class Throughput:
    """Simple samples/sec meter with async-dispatch awareness (call ``sync``
    with a device array to flush before reading)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.samples = 0

    def update(self, n: int):
        self.samples += n

    def rate(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        return self.samples / max(time.perf_counter() - self.t0, 1e-9)
