"""Differential parity against the ACTUAL reference implementation.

Loads the reference's pure-numpy kernels (countless2d,
stippled_countless2d, downsample_with_averaging_numpy, max/min/stride)
directly from /root/reference at test time — nothing is copied into
this repo; the reference is executed as an external oracle, exactly
like the DuckDB oracles.  The reference's Cython module isn't built in
this environment, so ``tinybrain.accelerated`` is stubbed before import
(none of the functions under test touch it).

Skipped automatically when /root/reference is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

from tinybrain_spark import kernels as K

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "tinybrain")),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref():
    """Import /root/reference/tinybrain/downsample.py with the compiled
    accelerated module stubbed out."""
    import importlib.util

    pkg = types.ModuleType("tinybrain")
    pkg.__path__ = [os.path.join(REF, "tinybrain")]
    accel = types.ModuleType("tinybrain.accelerated")
    saved = {
        k: sys.modules.get(k) for k in ("tinybrain", "tinybrain.accelerated")
    }
    sys.modules["tinybrain"] = pkg
    sys.modules["tinybrain.accelerated"] = accel
    try:
        spec = importlib.util.spec_from_file_location(
            "tinybrain.downsample", os.path.join(REF, "tinybrain", "downsample.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


RNG = np.random.default_rng(42)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32, np.uint64])
@pytest.mark.parametrize("shape", [(16, 16), (64, 32), (128, 128)])
def test_mode_pool_2d_matches_countless2d(ref, dtype, shape):
    img = RNG.integers(0, 12, size=shape).astype(dtype)
    want = ref.countless2d(img.copy())
    got = K.mode_pool_2d(img)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("zero_frac", [0.3, 0.6, 0.9])
def test_stippled_matches_reference(ref, zero_frac):
    img = RNG.integers(1, 9, size=(64, 64)).astype(np.uint32)
    img = np.where(RNG.random(img.shape) < zero_frac, 0, img)
    want = ref.stippled_countless2d(img.copy())
    # my 1-D stippled kernel over windows laid out in the reference's
    # np.ndindex order (a, b, c, d) = (0,0),(0,1),(1,0),(1,1)
    # (downsample.py:372-374 — note this differs from the C++ kernel's
    # b=(x+1,y); dense mode is invariant to the swap, the stippled
    # first-nonzero fallback is not)
    a, b, c, d = img[0::2, 0::2], img[0::2, 1::2], img[1::2, 0::2], img[1::2, 1::2]
    wins = np.stack([a, b, c, d], axis=-1).reshape(-1, 4).astype(np.int64)
    flat = wins.reshape(1, -1)
    got = K.mode_pool(flat, window=4, num_tiers=1, sparse=True)[0].reshape(
        a.shape
    )
    np.testing.assert_array_equal(got.astype(np.uint32), want)


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
@pytest.mark.parametrize("sparse", [False, True])
def test_avg_pool_2d_matches_reference_numpy(ref, dtype, sparse):
    img = RNG.integers(0, 200, size=(32, 48)).astype(dtype)
    if sparse:
        img = np.where(RNG.random(img.shape) < 0.5, np.zeros_like(img), img)
    want = ref.downsample_with_averaging_numpy(img, (2, 2), sparse=sparse)
    if sparse:
        a, b, c, d = (img[0::2, 0::2], img[1::2, 0::2],
                      img[0::2, 1::2], img[1::2, 1::2])
        wins = np.stack([a, b, c, d], axis=-1).reshape(1, -1).astype(
            np.float64 if np.dtype(dtype).kind == "f" else np.int64
        )
        got = K.avg_pool(wins, window=4, num_tiers=1, sparse=True,
                         dtype=dtype)[0].reshape(a.shape)
    else:
        got = K.avg_pool_2d(img, dtype=dtype)
    if np.dtype(dtype).kind == "f":
        np.testing.assert_allclose(got, want, rtol=1e-6)
    else:
        np.testing.assert_array_equal(got, want)


def test_max_min_stride_match_reference(ref):
    img = RNG.integers(-100, 100, size=(40, 24)).astype(np.int32)
    want_max = ref.downsample_with_max_pooling(img, (2, 2), num_mips=1)[0]
    want_min = ref.downsample_with_min_pooling(img, (2, 2), num_mips=1)[0]
    a, b, c, d = img[0::2, 0::2], img[1::2, 0::2], img[0::2, 1::2], img[1::2, 1::2]
    stacked = np.stack([a, b, c, d], axis=-1)
    np.testing.assert_array_equal(stacked.max(-1), want_max)
    np.testing.assert_array_equal(stacked.min(-1), want_min)
    wins = stacked.reshape(1, -1).astype(np.int64)
    np.testing.assert_array_equal(
        K.max_pool(wins, window=4)[0].reshape(a.shape), want_max
    )
    np.testing.assert_array_equal(
        K.min_pool(wins, window=4)[0].reshape(a.shape), want_min
    )

    want_stride = ref.downsample_with_striding(img, (4, 1), num_mips=1)[0]
    got_stride = np.stack(
        [K.stride_pool(img[:, j], window=4)[0] for j in range(img.shape[1])],
        axis=1,
    )
    np.testing.assert_array_equal(got_stride, want_stride)


def test_mode_of_modes_matches_recursive_countless(ref):
    """Tier chaining == the reference's recursive countless2d
    (downsample_segmentation_2d with factor 4 = two 2x2 passes)."""
    img = RNG.integers(0, 6, size=(32, 32)).astype(np.uint32)
    want = ref.countless2d(ref.countless2d(img.copy()).copy())
    got = K.mode_pool_2d(K.mode_pool_2d(img))
    np.testing.assert_array_equal(got, want)
