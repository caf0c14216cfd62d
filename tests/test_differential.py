"""Randomized differential tests: vectorized kernels vs the naive
per-window Python reference (tests/naive_ref.py), sweeping dtype /
sparsity / tiers / window / length parity — the reference repo's core
test pattern (automated_test.py:128-254)."""

import numpy as np
import pytest

from tinybrain_spark import kernels as K

import naive_ref as R

RNG = np.random.default_rng(42)

LENGTHS = [16, 64, 256, 17, 65, 100, 1024]
WINDOWS = [2, 4, 8]


def _rand(n, dtype, sparse):
    dt = np.dtype(dtype)
    if dt.kind == "f":
        vals = RNG.uniform(-100, 100, size=n).astype(dt)
    elif dt.kind == "u":
        vals = RNG.integers(0, min(np.iinfo(dt).max, 255) + 1, size=n).astype(dt)
    else:
        vals = RNG.integers(max(np.iinfo(dt).min, -127),
                            min(np.iinfo(dt).max, 255) + 1, size=n).astype(dt)
    if sparse:
        mask = RNG.random(n) < 0.6
        vals = np.where(mask, np.zeros_like(vals), vals)
    return vals


@pytest.mark.parametrize("window", WINDOWS)
@pytest.mark.parametrize("dtype", [np.uint8, np.int8, np.uint16, np.int16,
                                   np.int32, np.float32, np.float64])
@pytest.mark.parametrize("sparse", [False, True])
def test_avg_differential(window, dtype, sparse):
    for n in LENGTHS:
        tiers = 1
        while window ** (tiers + 1) <= n and tiers < 5:
            tiers += 1
        arr = _rand(n, dtype, sparse)
        got = K.avg_pool(arr, window=window, num_tiers=tiers,
                         sparse=sparse, dtype=dtype)
        want = R.naive_avg(arr, window, tiers, sparse=sparse, dtype=dtype)
        assert len(got) == len(want) == tiers
        for m, (g, w) in enumerate(zip(got, want)):
            if np.dtype(dtype).kind == "f":
                np.testing.assert_allclose(
                    g, w, rtol=1e-5, err_msg=f"n={n} tier={m}")
            else:
                np.testing.assert_array_equal(
                    g, w, err_msg=f"n={n} tier={m} window={window} "
                                  f"dtype={dtype} sparse={sparse}")


@pytest.mark.parametrize("window", WINDOWS)
@pytest.mark.parametrize("dtype", [np.uint8, np.int32, np.uint64, np.int64])
@pytest.mark.parametrize("sparse", [False, True])
def test_mode_differential(window, dtype, sparse):
    for n in LENGTHS:
        tiers = 1
        while window ** (tiers + 1) <= n and tiers < 4:
            tiers += 1
        arr = _rand(n, dtype, sparse)
        # cluster values so modes are meaningful
        arr = (arr.astype(np.int64) % 7).astype(dtype)
        got = K.mode_pool(arr, window=window, num_tiers=tiers, sparse=sparse)
        want = R.naive_mode(arr, window, tiers, sparse=sparse)
        for m, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_array_equal(
                g, w, err_msg=f"n={n} tier={m} window={window} sparse={sparse}")


@pytest.mark.parametrize("window", WINDOWS)
@pytest.mark.parametrize("kind,fn", [("max", max), ("min", min)])
def test_max_min_differential(window, kind, fn):
    for n in LENGTHS:
        tiers = 2 if n >= window**2 else 1
        arr = _rand(n, np.int32, False)
        got = K.pool(kind, arr, window=window, num_tiers=tiers)
        want = R.naive_reduce(arr, window, tiers, fn)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w, err_msg=f"n={n}")


@pytest.mark.parametrize("window", WINDOWS)
def test_stride_differential(window):
    for n in LENGTHS:
        tiers = 2 if n >= window**2 else 1
        arr = _rand(n, np.int32, False)
        got = K.stride_pool(arr, window=window, num_tiers=tiers)
        want = R.naive_stride(arr, window, tiers)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


def test_batch_equals_per_row():
    """2-D batch kernels must equal per-row 1-D invocation."""
    batch = RNG.integers(0, 256, size=(32, 64)).astype(np.int32)
    for kind in ("avg", "mode", "max", "min", "stride"):
        got = K.pool(kind, batch, window=4, num_tiers=2)
        for i in range(batch.shape[0]):
            row = K.pool(kind, batch[i], window=4, num_tiers=2)
            for g, r in zip(got, row):
                np.testing.assert_array_equal(g[i], r)


@pytest.mark.parametrize("dtype,sparse", [
    (np.int16, False), (np.int16, True),   # cycle 5 (pyx:910)
    (np.int32, False),                     # cycle 8 (pyx:742)
])
def test_w8_deep_cycle_renorm(dtype, sparse):
    """w=8 tiers crossing the accumulator cycle boundary: 16-bit dtypes
    renormalize every 5 tiers (pyx:910, incl. the denominator shift
    quirk pyx:758-761), wider dtypes every 8. Needs 8^6 tokens for the
    16-bit boundary — the one cycle variant deep-tier oracle queries
    can't reach at test scale."""
    n = 8 ** 6
    arr = RNG.integers(0, 100, size=n).astype(dtype)
    if sparse:
        arr[RNG.random(n) < 0.5] = 0
    tiers = 6 if np.dtype(dtype).itemsize == 2 else 6
    got = K.avg_pool(arr, window=8, num_tiers=tiers, sparse=sparse,
                     dtype=dtype)
    want = R.naive_avg(arr, 8, tiers, sparse=sparse, dtype=dtype)
    for t, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g, np.asarray(w, dtype=dtype),
                                      err_msg=f"tier {t+1}")
