"""Loader (the DataLoader replacement): ordering, shuffling determinism,
drop_last, exception propagation, and the bounded decode look-ahead (a
slow consumer must hold O(prefetch + workers) batches on the host, not the
whole epoch)."""

import threading
import time

import numpy as np
import pytest

from arseg_tpu.data.loader import Loader, device_prefetch


class _Counting:
    """Dataset that records how many samples have been fetched."""

    def __init__(self, n):
        self.n = n
        self.fetched = 0
        self.lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self.lock:
            self.fetched += 1
        return {"x": np.full((2,), i, np.int32)}


def test_order_batching_and_len():
    ds = _Counting(10)
    ld = Loader(ds, batch_size=3, num_workers=3)
    assert len(ld) == 4
    batches = list(ld)
    got = np.concatenate([b["x"][:, 0] for b in batches])
    np.testing.assert_array_equal(got, np.arange(10))
    assert [b["x"].shape[0] for b in batches] == [3, 3, 3, 1]

    ld = Loader(ds, batch_size=3, drop_last=True)
    assert len(ld) == 3
    assert sum(b["x"].shape[0] for b in ld) == 9


def test_shuffle_seed_determinism():
    ds = _Counting(16)
    a = np.concatenate([b["x"][:, 0] for b in Loader(ds, 4, shuffle=True, seed=7)])
    ds2 = _Counting(16)
    b = np.concatenate([b["x"][:, 0] for b in Loader(ds2, 4, shuffle=True, seed=7)])
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, np.arange(16))  # actually shuffled
    np.testing.assert_array_equal(np.sort(a), np.arange(16))  # a permutation


def test_exception_propagates():
    class Boom(_Counting):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("bad sample")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="bad sample"):
        list(Loader(Boom(8), batch_size=2, num_workers=2))


def test_bounded_lookahead():
    """Workers must not race through the epoch ahead of a slow consumer:
    in-flight decode is bounded by prefetch + num_workers batches (plus the
    emitter queue), not the dataset size."""
    ds = _Counting(400)
    ld = Loader(ds, batch_size=1, num_workers=2, prefetch=2)
    it = iter(ld)
    next(it)
    time.sleep(0.5)  # give the workers every chance to run away
    # bound: prefetch(2) + workers(2) look-ahead + prefetch(2) emitter queue
    # + the consumed one + scheduling slack
    assert ds.fetched <= 12, f"unbounded look-ahead: {ds.fetched} fetched"
    rest = sum(b["x"].shape[0] for b in it)
    assert rest == 399
    assert ds.fetched == 400


def test_device_prefetch_passthrough():
    ds = _Counting(6)
    ld = Loader(ds, batch_size=2)
    out = list(device_prefetch(ld, size=2))
    got = np.concatenate([np.asarray(b["x"])[:, 0] for b in out])
    np.testing.assert_array_equal(got, np.arange(6))
