"""Background-prefetching batch loader.

The reference gets input-pipeline parallelism from torch DataLoader worker
processes (reference: train.py:99-112). Here a thread pool collates batches
ahead of the training step and initiates the host->device transfer early, so
the accelerator never waits on input (JAX dispatch is async; device_put in
the producer thread overlaps with the running step).
"""
import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


class PrefetchLoader:
    """Wrap a batch-producing iterable; keep ``buffer_size`` ready batches,
    optionally placed on device (or sharded) by ``place_fn``."""

    def __init__(
        self,
        batch_factory: Callable[[], Iterable],
        buffer_size: int = 4,
        place_fn: Optional[Callable] = None,
    ):
        self.batch_factory = batch_factory
        self.buffer_size = buffer_size
        self.place_fn = place_fn or jax.device_put

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.buffer_size)
        sentinel = object()
        error = []

        def producer():
            try:
                for batch in self.batch_factory():
                    q.put(self.place_fn(batch))
            except Exception as e:  # propagate to consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
