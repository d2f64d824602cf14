"""Input pipeline: per-host sharded HDF5 reads + device prefetch.

The reference reads the whole HDF5 into host memory in one process
(`common/dataset_loader.py:9-20`) and feeds the TF strategy from a Python
generator. TPU-native equivalent:

- :class:`ShardedHDF5Reader` slices each split across JAX processes
  (multi-host data parallelism reads disjoint sample shards; single-host
  reads everything), keeping per-host memory flat as datasets grow;
- :func:`prefetch_to_mesh` overlaps host batch assembly and host->device
  transfer with device compute (double buffering), so the train step never
  waits on the generator.
"""

from __future__ import annotations

import collections
import threading
from typing import Iterable, Iterator, Optional

import h5py
import jax

from .mesh import shard_batch


class ShardedHDF5Reader:
    """Reads a split's images/labels with per-process sample sharding.

    Shard layout is strided (sample i belongs to process ``i % P``) so
    class balance is preserved across hosts without a shuffle pass.
    """

    def __init__(
        self,
        path,
        split: str = "train",
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.path = path
        self.split = split
        self.process_index = (
            jax.process_index() if process_index is None else process_index
        )
        self.process_count = (
            jax.process_count() if process_count is None else process_count
        )

    def load(self):
        from ..common.dataset_loader import _load_split

        # The strided shard is selected inside the h5py read, so each
        # host only ever materializes its own 1/P of the split.
        shard = slice(self.process_index, None, self.process_count)
        with h5py.File(self.path, "r") as f:
            total = f[f"{self.split}_images"].shape[0]
            images, labels = _load_split(f, self.split, sample_slice=shard)
        if self.process_count > 1:
            # Trim every shard to the smallest shard size (floor(N/P)):
            # with N % P != 0 the low-index processes otherwise hold one
            # extra sample, their generators run one extra step per
            # epoch, and the other processes' train-step collectives
            # block forever — the same trim the training driver applies
            # to its own shards (training/training.py multi-process
            # shard setup).
            n = total // self.process_count
            images, labels = images[:n], labels[:n]
        return images, labels


def prefetch_to_mesh(
    batches: Iterable, mesh, size: int = 2
) -> Iterator:
    """Iterate ``batches`` (pytrees of numpy arrays), moving them onto the
    mesh (batch axis sharded over devices) ``size`` steps ahead of the
    consumer on a background thread."""
    queue = collections.deque()
    lock = threading.Semaphore(0)
    space = threading.Semaphore(size)
    cancelled = threading.Event()
    _done = object()

    def producer():
        # Any failure (source iterator raising, device_put during a
        # tunnel outage) must reach the consumer: a silently-dead
        # producer would leave it blocked on `lock` forever.
        try:
            for batch in batches:
                space.acquire()
                if cancelled.is_set():
                    return
                queue.append(shard_batch(batch, mesh))
                lock.release()
            queue.append(_done)
        except BaseException as exc:  # re-raised on the consumer side
            queue.append(exc)
        lock.release()

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    try:
        while True:
            lock.acquire()
            item = queue.popleft()
            if item is _done:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
            space.release()
    finally:
        # A consumer that stops early (interrupt, exception) must unblock
        # the producer, or it would hold `size` sharded device batches and
        # the source generator alive for the rest of the process.
        cancelled.set()
        space.release()


def device_prefetch(batches: Iterable, size: int = 2) -> Iterator:
    """Single-device variant: ``jax.device_put`` ahead of the consumer.

    JAX's async dispatch overlaps the enqueued H2D copies with compute, so
    simply staying ``size`` transfers ahead gives double buffering.
    """
    it = iter(batches)
    buf = collections.deque()
    try:
        for _ in range(size):
            buf.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield out
