"""PrefetchLoader: multi-worker batch prefetching semantics."""
import time

import numpy as np
import pytest

from romp_tpu.train.data.loader import PrefetchLoader


def _iter_factory(counters=None, delay=0.0):
    def make(seed):
        rng = np.random.RandomState(seed)
        while True:
            if counters is not None:
                counters[seed] = counters.get(seed, 0) + 1
            if delay:
                time.sleep(delay)
            yield {"seed": np.full((2,), seed), "x": rng.rand(2, 3)}

    return make


def test_single_worker_matches_plain_iterator():
    plain = _iter_factory()(7)
    loader = PrefetchLoader(_iter_factory(), num_workers=1, prefetch=2,
                            seed=7)
    try:
        for _ in range(5):
            a = next(plain)
            b = next(loader)
            np.testing.assert_array_equal(a["x"], b["x"])
            np.testing.assert_array_equal(a["seed"], b["seed"])
    finally:
        loader.close()


def test_multi_worker_interleaves_all_seeds():
    counters = {}
    loader = PrefetchLoader(_iter_factory(counters, delay=0.002),
                            num_workers=3, prefetch=2, seed=10)
    try:
        seeds = set()
        for _ in range(30):
            seeds.update(next(loader)["seed"].tolist())
        assert seeds == {10, 11, 12}
    finally:
        loader.close()


def test_worker_exception_propagates():
    def make(seed):
        yield {"x": np.zeros(1)}
        raise ValueError("converter blew up")

    loader = PrefetchLoader(make, num_workers=1, prefetch=2)
    try:
        next(loader)
        with pytest.raises(ValueError, match="converter blew up"):
            # the queue may hold one more good batch; drain until the error
            for _ in range(3):
                next(loader)
    finally:
        loader.close()


def test_close_joins_quickly():
    loader = PrefetchLoader(_iter_factory(), num_workers=2, prefetch=2)
    next(loader)
    t0 = time.time()
    loader.close()
    assert time.time() - t0 < 5
    for t in loader._threads:
        assert not t.is_alive()
