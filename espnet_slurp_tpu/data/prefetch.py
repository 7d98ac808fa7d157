"""Background batch prefetching: overlap host-side IO with device steps.

Parity target: the reference's DataLoader worker processes
(abs_task.py num_workers; SURVEY §3.1 'DataLoader worker procs'). Here the
audio decode is already native C++ threads (native/wavio.cpp), so a single
Python producer thread with a bounded queue suffices to hide collation +
decode behind the device step — the jitted step releases the GIL while the
accelerator runs, so producer and consumer genuinely overlap.

Usage: wrap any iter factory —

    train_if = prefetch_factory(train_if, depth=2)
    trainer.run(state, train_if, valid_if)
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable

_END = object()


def prefetch_iter(it: Iterable, depth: int = 2):
    """Iterate ``it`` on a daemon producer thread, ``depth`` batches ahead.

    Exceptions in the producer re-raise at the consumer's next pull, so
    failures keep their stack context instead of vanishing in a thread.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err = []

    def produce():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item


def prefetch_factory(factory: Callable[[int], Iterable],
                     depth: int = 2) -> Callable[[int], Iterable]:
    """Wrap an epoch-indexed iter factory with background prefetching."""
    def wrapped(epoch: int):
        return prefetch_iter(factory(epoch), depth)
    return wrapped


def prefetch_to_device(it: Iterable, depth: int = 2):
    """prefetch_iter + async jax.device_put: batches are decoded, collated
    AND issued to the device ``depth`` steps ahead, so the host->device
    transfer overlaps the previous device step (flax prefetch_to_device
    pattern; the reference's pin_memory + non_blocking copy analogue).

    Yields pytrees of device arrays.
    """
    import jax

    def put(batch):
        return jax.tree.map(jax.device_put, batch)

    return prefetch_iter((put(b) for b in it), depth=depth)
