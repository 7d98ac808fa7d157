"""Prefetching iterator: order, completeness, exception propagation."""
import time

import pytest

from espnet_slurp_tpu.data.prefetch import prefetch_factory, prefetch_iter


def test_prefetch_preserves_order_and_items():
    items = list(range(50))
    got = list(prefetch_iter(iter(items), depth=4))
    assert got == items


def test_prefetch_overlaps_producer_and_consumer():
    def slow_gen():
        for i in range(5):
            time.sleep(0.05)  # producer work
            yield i

    t0 = time.time()
    for _ in prefetch_iter(slow_gen(), depth=2):
        time.sleep(0.05)      # consumer work
    overlapped = time.time() - t0
    # serial would be ~0.5 s; overlapped should be well under
    assert overlapped < 0.45


def test_prefetch_propagates_exceptions():
    def bad_gen():
        yield 1
        raise ValueError("boom")

    it = prefetch_iter(bad_gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_factory_epoch_passthrough():
    calls = []

    def factory(epoch):
        calls.append(epoch)
        return iter([epoch, epoch + 1])

    wrapped = prefetch_factory(factory)
    assert list(wrapped(3)) == [3, 4]
    assert calls == [3]
