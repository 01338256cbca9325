"""DevicePrefetcher: order preservation, exhaustion, error propagation, close()."""
import time

import jax.numpy as jnp
import numpy as np
import pytest

from topomap_tpu.data.prefetch import DevicePrefetcher


def test_prefetch_preserves_order_and_prepares():
    src = iter(range(20))
    pf = DevicePrefetcher(src, prepare_fn=lambda i: jnp.asarray([i, i * 2]), depth=3)
    out = list(pf)
    assert len(out) == 20
    for i, a in enumerate(out):
        np.testing.assert_array_equal(np.asarray(a), [i, i * 2])


def test_prefetch_overlaps_host_work():
    """Producer runs ahead while the consumer works: after the consumer's first slow step,
    the queue must already hold staged batches (overlap), regardless of machine load."""
    def slow_src():
        for i in range(6):
            time.sleep(0.02)
            yield i

    pf = DevicePrefetcher(slow_src(), depth=2)
    first = next(pf)
    assert first == 0
    time.sleep(0.3)  # consumer "step" — producer should fill the queue meanwhile
    assert pf._q.qsize() >= 2  # depth buffered ahead
    assert list(pf) == [1, 2, 3, 4, 5]


def test_prefetch_propagates_error():
    def bad_src():
        yield 1
        raise RuntimeError("loader died")

    pf = DevicePrefetcher(bad_src())
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        next(pf)
        next(pf)


def test_prefetch_close_unblocks():
    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    pf = DevicePrefetcher(infinite(), depth=2)
    assert next(pf) == 0
    pf.close()  # must not hang
