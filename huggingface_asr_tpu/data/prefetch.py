"""Background batch prefetching.

The reference overlaps host-side data work with GPU compute via PyTorch's
multi-process DataLoader (persistent workers, training_arguments.py:101-109).
TPU-natively, batch ASSEMBLY is cheap (native collate) but Arrow reads and
tokenization still cost milliseconds — a small thread pool keeps a bounded
queue of ready batches ahead of the train step, optionally already
transferred to device (overlapping host→HBM DMA with the previous step).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import numpy as np


class PrefetchIterator:
    """Wrap a batch iterator with an N-deep background prefetch queue."""

    _SENTINEL = object()

    def __init__(
        self,
        source: Iterable[Dict[str, np.ndarray]],
        depth: int = 2,
        device_put: Optional[Callable[[Dict[str, np.ndarray]], Any]] = None,
    ):
        self._source = iter(source)
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._device_put = device_put
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._source:
                if self._device_put is not None:
                    batch = self._device_put(batch)
                self._queue.put(batch)
        except BaseException as e:  # propagate into the consumer
            self._error = e
        finally:
            self._queue.put(self._SENTINEL)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def sharded_device_put(mesh):
    """A device_put that shards the batch dim over the mesh's data axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(batch):
        return {
            k: v if k.startswith("_") else jax.device_put(
                v, NamedSharding(mesh, P("data", *([None] * (np.ndim(v) - 1))))
            )
            for k, v in batch.items()
        }

    return put
