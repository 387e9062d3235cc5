"""DevicePrefetcher unit tests (data/prefetch.py)."""

import time

import numpy as np
import pytest

from voice100_tpu.data.prefetch import DevicePrefetcher


def test_yields_in_order_with_place():
    seen = []

    def place(x):
        seen.append(x)
        return x * 10

    out = list(DevicePrefetcher(range(7), size=2, place=place))
    assert out == [i * 10 for i in range(7)]
    assert seen == list(range(7))


def test_default_place_is_device_put():
    batches = [np.full((2, 3), i, np.float32) for i in range(3)]
    out = list(DevicePrefetcher(batches, size=2))
    import jax

    assert all(isinstance(o, jax.Array) for o in out)
    np.testing.assert_array_equal(np.asarray(out[1]), batches[1])


def test_early_close_releases_worker():
    def slow_gen():
        for i in range(100):
            yield i

    pf = DevicePrefetcher(slow_gen(), size=2, place=lambda x: x)
    assert next(pf) == 0
    pf.close()
    # worker must exit promptly even though 97 items were never read
    pf._thread.join(timeout=5.0)
    assert not pf._thread.is_alive()
    with pytest.raises(StopIteration):
        next(pf)


def test_worker_exception_propagates():
    def bad_gen():
        yield 1
        raise ValueError("decode failed")

    pf = DevicePrefetcher(bad_gen(), size=2, place=lambda x: x)
    assert next(pf) == 1
    with pytest.raises(ValueError, match="decode failed"):
        while True:
            next(pf)


def test_prefetch_overlaps_producer_and_consumer():
    """With a window of 2, total wall time approaches
    max(producer, consumer) rather than their sum."""

    def gen():
        for i in range(8):
            time.sleep(0.04)
            yield i

    t0 = time.perf_counter()
    n = 0
    for _ in DevicePrefetcher(gen(), size=2, place=lambda x: x):
        time.sleep(0.04)
        n += 1
    elapsed = time.perf_counter() - t0
    assert n == 8
    # serial would be ~0.64s; overlapped ~0.36s. The 0.55 bound keeps
    # ~90ms of scheduler-jitter headroom while still failing if the
    # pipeline ever serializes.
    assert elapsed < 0.55, elapsed
