"""Hypothesis property tests for the pooling kernels — complements the
golden/differential suites with law-based checks (the reference's
randomized strategy, automated_test.py:128-254, generalized)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tinybrain_spark import kernels as K

tokens_lists = st.lists(
    st.integers(min_value=0, max_value=255), min_size=8, max_size=200
)
windows = st.sampled_from([2, 4, 8])


@settings(max_examples=200, deadline=None)
@given(tokens_lists, windows)
def test_avg_bounded_by_min_max(vals, window):
    arr = np.array(vals, dtype=np.int32)
    out = K.avg_pool(arr, window=window, num_tiers=1, dtype=np.int32)[0]
    assert out.min() >= arr.min() - 1  # floor rounding
    assert out.max() <= arr.max()
    assert len(out) == K.out_len(len(arr), window)


@settings(max_examples=200, deadline=None)
@given(tokens_lists, windows)
def test_mode_output_drawn_from_window(vals, window):
    arr = np.array(vals, dtype=np.int32)
    out = K.mode_pool(arr, window=window, num_tiers=1)[0]
    for j, v in enumerate(out):
        win = arr[j * window : (j + 1) * window]
        assert v in win


@settings(max_examples=200, deadline=None)
@given(tokens_lists, windows)
def test_sparse_mode_prefers_nonzero(vals, window):
    arr = np.array(vals, dtype=np.int32)
    out = K.mode_pool(arr, window=window, num_tiers=1, sparse=True)[0]
    n_full = len(arr) // window
    for j in range(n_full):
        win = arr[j * window : (j + 1) * window]
        if (win != 0).any():
            assert out[j] != 0
        else:
            assert out[j] == 0


@settings(max_examples=200, deadline=None)
@given(tokens_lists, windows)
def test_max_ge_avg_ge_min(vals, window):
    arr = np.array(vals, dtype=np.int32)
    mx = K.max_pool(arr, window=window)[0]
    mn = K.min_pool(arr, window=window)[0]
    av = K.avg_pool(arr, window=window, dtype=np.int32)[0]
    assert (mx >= av).all() and (av >= mn).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=255), min_size=64,
                max_size=64))
def test_constant_input_fixed_point(vals):
    arr = np.full(64, vals[0], dtype=np.int32)
    for kind in ("avg", "mode", "max", "min", "stride"):
        tiers = K.pool(kind, arr, window=4, num_tiers=3, dtype=np.int32)
        for t in tiers:
            assert (t == vals[0]).all(), kind


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62),
                min_size=0, max_size=300))
def test_gorilla_values_roundtrip(vals):
    from tinybrain_spark import gorilla as G

    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(G.decode_values(G.encode_values(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40),
                min_size=0, max_size=300))
def test_gorilla_timestamps_roundtrip(vals):
    from tinybrain_spark import gorilla as G

    arr = np.array(sorted(vals), dtype=np.int64)
    assert np.array_equal(G.decode_timestamps(G.encode_timestamps(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(tokens_lists, st.integers(min_value=2, max_value=9))
def test_avg_generic_is_truncated_window_mean(vals, window):
    """The generic path equals the per-window truncated arithmetic mean
    (incl. partial tails), matching downsample.py:118-145."""
    arr = np.array(vals, dtype=np.int32)
    if len(arr) < window:  # below one window the guard raises (pyx:89-90)
        return
    out = K.avg_pool_generic(arr, window=window, num_tiers=1)[0]
    assert len(out) == K.out_len(len(arr), window)
    for j, v in enumerate(out):
        win = arr[j * window : (j + 1) * window]
        assert v == int(np.float32(win.sum()) / len(win))


@settings(max_examples=200, deadline=None)
@given(tokens_lists, st.sampled_from([2, 4, 8]))
def test_avg_generic_matches_accumulator_tier1(vals, window):
    """On PoT windows with full windows only, one generic tier equals
    one accumulator tier (shift == floor-div for non-negatives)."""
    arr = np.array(vals, dtype=np.int32)
    n = len(arr) // window * window
    if n == 0:
        return
    arr = arr[:n]
    gen = K.avg_pool_generic(arr, window=window, num_tiers=1)[0]
    acc = K.avg_pool(arr, window=window, num_tiers=1, dtype=np.int32)[0]
    assert np.array_equal(gen, acc)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, width=32
        ),
        min_size=8,
        max_size=64,
    ),
    st.sampled_from([2, 4, 8]),
)
def test_mode_float_bit_view_equals_uint_mode(vals, window):
    """Float mode == integer mode over the raw bits (pyx:1198-1231)."""
    arr = np.array(vals, dtype=np.float32)
    got = K.mode_pool(arr, window=window, num_tiers=1)[0]
    want = K.mode_pool(
        arr.view(np.uint32), window=window, num_tiers=1
    )[0].view(np.float32)
    assert np.array_equal(got.view(np.uint32), want.view(np.uint32))


@settings(max_examples=150, deadline=None)
@given(tokens_lists, st.sampled_from([2, 4, 8]), st.integers(1, 3))
def test_float_avg_is_exact_mean(vals, window, tiers):
    """Float tiers divide the running block sum by w^(m+1) with no
    truncation: tier m equals the exact mean over w^(m+1) inputs for
    values where float32 arithmetic is exact (small ints)."""
    arr = np.array(vals, dtype=np.int32)
    n = len(arr) // window**tiers * window**tiers
    if n == 0:
        return
    arr = arr[:n]
    out = K.avg_pool(
        arr.astype(np.float32), window=window, num_tiers=tiers,
        dtype=np.float32,
    )[tiers - 1]
    span = window**tiers
    want = arr.reshape(-1, span).sum(axis=1) / span
    assert np.allclose(out, want, rtol=0, atol=0)
