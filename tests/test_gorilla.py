"""Gorilla XOR + delta-of-delta round-trip tests (FIXTURES.md F4)."""

import numpy as np
import pytest

from tinybrain_spark import gorilla as G

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("vals", [
    [],
    [5],
    [5, 5, 5, 5],
    [0, 1, 2, 3, 1 << 40, -(1 << 40), -1, 0],
    list(RNG.integers(0, 256, 1000)),
    list(RNG.integers(-(2**62), 2**62, 500)),
])
def test_values_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    buf = G.encode_values(arr)
    out = G.decode_values(buf)
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("ts", [
    [],
    [100],
    [100, 160],
    [100, 160, 220, 280, 340],          # constant delta -> all dod 0
    [0, 60, 120, 121, 300, 301, 999999],
    list(np.cumsum(RNG.integers(1, 1000, 800))),
    [0, -50, -100, 10**12, -10**12],
])
def test_timestamps_roundtrip(ts):
    arr = np.array(ts, dtype=np.int64)
    buf = G.encode_timestamps(arr)
    out = G.decode_timestamps(buf)
    np.testing.assert_array_equal(out, arr)


def test_series_roundtrip_and_compression():
    buckets = np.arange(0, 512, dtype=np.int64) * 60
    vals = RNG.integers(0, 64, 512).astype(np.int64)  # small dynamic range
    blob = G.encode_series(buckets, vals)
    b2, v2 = G.decode_series(blob)
    np.testing.assert_array_equal(b2, buckets)
    np.testing.assert_array_equal(v2, vals)
    raw = 16 * len(vals)  # int64 bucket + int64 value
    assert len(blob) < raw * 0.5, (len(blob), raw)


def test_constant_series_is_tiny():
    buckets = np.arange(1000, dtype=np.int64)
    vals = np.full(1000, 42, dtype=np.int64)
    blob = G.encode_series(buckets, vals)
    assert len(blob) < 300  # ~1 bit/point in each stream


def test_bad_magic():
    with pytest.raises(ValueError):
        G.decode_series(b"XXXX1234")
