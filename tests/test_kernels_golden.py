"""Golden truth-table tests ported from the reference's micro-cases
(automated_test.py:256-310, :503-608, :610-716, :718-824, :827-884,
:363-501), recast from 2x2 image patches to 4/8-token windows per
FIXTURES.md §F2."""

import numpy as np
import pytest

from tinybrain_spark import kernels as K


def one(kind, arr, window=4, sparse=False, dtype=None, tiers=1):
    res = K.pool(kind, np.asarray(arr), window=window, num_tiers=tiers,
                 sparse=sparse, dtype=dtype)
    return res[tiers - 1]


# ---- mode 2x2 (countless) tie-break: automated_test.py:256-310 ----

@pytest.mark.parametrize("win,expected", [
    ([0, 1, 2, 3], 3),   # all different -> d
    ([0, 0, 2, 3], 0),   # a==b -> a
    ([1, 1, 2, 2], 1),   # a==b beats c==d
    ([1, 2, 2, 2], 2),   # b==c -> b
    ([5, 5, 5, 5], 5),   # all same
    ([1, 2, 1, 3], 1),   # a==c -> a
    ([255, 255, 1, 2], 255),  # uint8 overflow guard
])
def test_mode4_tiebreak(win, expected):
    for dt in (np.uint8, np.int32, np.uint64):
        if dt == np.uint8 and max(win) > 255:
            continue
        out = one("mode", np.array(win, dtype=dt))
        assert out.tolist() == [expected], (win, dt)
        assert out.dtype == dt


# ---- stippled countless (sparse mode 2x2): automated_test.py:827-884 ----

@pytest.mark.parametrize("win,expected", [
    ([1, 2, 3, 4], 4),       # all different, no zeros -> d
    ([0, 2, 3, 4], 4),       # d nonzero -> d
    ([1, 2, 3, 0], 1),       # d zero -> first nonzero of a,b,c
    ([0, 0, 3, 0], 3),
    ([1, 0, 0, 0], 1),       # lone pixel inflates
    ([0, 0, 0, 0], 0),       # all background
    ([0, 2, 2, 4], 2),       # b==c nonzero pair wins over d
    ([5, 5, 0, 4], 5),       # a==b pair
    ([5, 0, 5, 4], 5),       # a==c pair
    ([0, 0, 4, 9], 9),       # zero pair must NOT win -> d
])
def test_stippled_mode4(win, expected):
    out = one("mode", np.array(win, dtype=np.int64), sparse=True)
    assert out.tolist() == [expected], win


# ---- mode 2x2x2 (8-way counting): automated_test.py:503-608, 610-716 ----

@pytest.mark.parametrize("win,expected,sparse", [
    ([7, 7, 7, 7, 7, 7, 7, 7], 7, False),
    ([1, 1, 1, 1, 2, 3, 4, 5], 1, False),       # first 4 equal -> instant
    ([1, 2, 3, 4, 5, 5, 5, 5], 5, False),       # second 4 equal
    ([1, 2, 1, 2, 1, 2, 9, 9], 1, False),       # 3 vs 3 vs 2, tie->earliest
    ([2, 1, 2, 1, 2, 1, 9, 9], 2, False),
    ([1, 1, 2, 2, 2, 2, 1, 0], 2, False),       # count 4 wins
    ([1, 1, 2, 2, 2, 2, 1, 0], 2, True),
    ([0, 0, 2, 0, 0, 0, 0, 0], 2, True),        # zeros skipped
    ([0, 0, 0, 0, 0, 0, 0, 0], 0, True),        # all background -> 0
    ([0, 0, 0, 0, 0, 0, 0, 0], 0, False),       # dense mode of zeros is 0
    ([3, 0, 0, 0, 0, 0, 0, 4], 3, True),        # tie 1-1 -> earliest nonzero
])
def test_mode8(win, expected, sparse):
    out = one("mode", np.array(win, dtype=np.int64), window=8, sparse=sparse)
    assert out.tolist() == [expected], (win, sparse)


# ---- sparse avg integer division: automated_test.py:718-824 ----

@pytest.mark.parametrize("win,expected", [
    ([7, 1, 2, 2, 2, 2, 1, 1], 2),   # 18 // 8 = 2 (all nonzero)
    ([1, 1, 2, 2, 2, 2, 1, 0], 1),   # 11 // 7 = 1
    ([0, 0, 2, 0, 0, 0, 0, 0], 2),   # 2 // 1
    ([0, 0, 0, 0, 0, 0, 0, 0], 0),   # denom 0 -> 0
])
def test_sparse_avg8(win, expected):
    out = one("avg", np.array(win, dtype=np.uint8), window=8, sparse=True,
              dtype=np.uint8)
    assert out.tolist() == [expected], win


# ---- dense avg semantics: accum >> 2(m+1) ----

def test_avg4_shift():
    out = one("avg", np.array([1, 2, 3, 4], dtype=np.uint8), dtype=np.uint8)
    assert out.tolist() == [10 >> 2]  # 2

def test_avg4_signed_rounds_toward_zero():
    # render_image signed branch: -(abs(a) >> shift), hpp:934-939
    out = one("avg", np.array([-1, -1, -1, -1], dtype=np.int8), dtype=np.int8)
    assert out.tolist() == [-1]
    out = one("avg", np.array([-1, -1, -1, 0], dtype=np.int8), dtype=np.int8)
    assert out.tolist() == [0]  # -3 >> 2 toward zero = 0 (not -1)

def test_avg_float_divides():
    out = one("avg", np.array([1, 2, 3, 4], dtype=np.float32),
              dtype=np.float32)
    assert np.allclose(out, [2.5])


# ---- multi-tier truncation invariant: automated_test.py:145-148 ----

def test_avg_no_truncation_for_four_tiers():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=4**4, dtype=np.int64).astype(np.uint8)
    mips = K.avg_pool(arr, window=4, num_tiers=4, dtype=np.uint8)
    # tier 4 (index 3) must equal the one-shot 256:1 average (floor)
    expected = int(arr.astype(np.int64).sum()) >> 8
    assert mips[3].tolist() == [expected]

def test_avg_renorm_after_cycle():
    # five tiers with window 4: tier 5 renders from a renormalized
    # accumulator -> floor(floor(sum/256)·windows / 4) semantics
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=4**5, dtype=np.int64).astype(np.uint8)
    mips = K.avg_pool(arr, window=4, num_tiers=5, dtype=np.uint8)
    acc4 = arr.astype(np.int64).reshape(-1, 4**4).sum(axis=1) >> 8
    expected = int(acc4.sum()) >> 2
    assert mips[4].tolist() == [expected]


# ---- max/min incl. negatives: automated_test.py:363-501 ----

@pytest.mark.parametrize("win,mx,mn", [
    ([-1, 0, 0, 0], 0, -1),
    ([0, 1, 0, 2], 2, 0),
    ([5, 5, 5, 5], 5, 5),
    ([-7, -3, -9, -1], -1, -9),
])
def test_max_min(win, mx, mn):
    arr = np.array(win, dtype=np.int32)
    assert one("max", arr).tolist() == [mx]
    assert one("min", arr).tolist() == [mn]


# ---- striding ----

def test_stride():
    arr = np.arange(16, dtype=np.int32)
    assert one("stride", arr).tolist() == [0, 4, 8, 12]
    two = K.stride_pool(arr, window=4, num_tiers=2)[1]
    assert two.tolist() == [0]  # second tier strides the strided output


# ---- edge rules ----

def test_avg_partial_window_doubles():
    # trailing [x, y] with window 4 -> mean of x,y (edge doubling,
    # accelerated.hpp:66-69)
    out = one("avg", np.array([1, 2, 3, 4, 10, 20], dtype=np.uint8),
              dtype=np.uint8)
    assert out.tolist() == [2, 15]

def test_mode_partial_window_copies_first():
    out = one("mode", np.array([1, 2, 3, 4, 9, 8], dtype=np.int32))
    assert out.tolist() == [4, 9]


# ---- validation guards: accelerated.pyx:89-90 ----

def test_min_size_guard():
    with pytest.raises(ValueError):
        K.avg_pool(np.arange(8, dtype=np.int32), window=4, num_tiers=2)
    with pytest.raises(ValueError):
        K.mode_pool(np.arange(3, dtype=np.int32), window=4, num_tiers=1)

def test_bad_window():
    # the ACCUMULATOR kernel is pinned to the accelerated windows; the
    # generic path (pool/avg_pool_generic) takes any window >= 2
    with pytest.raises(ValueError):
        K.avg_pool(np.arange(8, dtype=np.int32), window=3)
    with pytest.raises(ValueError):
        K.avg_pool_generic(np.arange(8, dtype=np.int32), window=1)


def test_avg_generic_w3():
    # [1,2,3 | 4,5,6 | 7] -> [2, 5, 7]; partial tail averages what's there
    out = K.avg_pool_generic(np.array([1, 2, 3, 4, 5, 6, 7], dtype=np.int32), 3)
    assert out[0].tolist() == [2, 5, 7]
    # truncation toward zero via float temp: [1,1,0] -> 0 (2/3)
    out = K.avg_pool_generic(np.array([1, 1, 0], dtype=np.int32), 3)
    assert out[0].tolist() == [0]
    # sparse: zero-only window -> 0 (clamped count), zeros excluded
    out = K.avg_pool_generic(
        np.array([0, 0, 3, 0, 0, 0], dtype=np.int32), 3, sparse=True
    )
    assert out[0].tolist() == [3, 0]
    # per-tier truncation (NO shared accumulator on the generic path):
    # tier2 of [1]*9 w3: tier1=[1,1,1] -> tier2=[1]
    out = K.avg_pool_generic(np.ones(9, dtype=np.int32), 3, num_tiers=2)
    assert out[1].tolist() == [1]
    # dispatch through pool()
    out = K.pool("avg", np.array([1, 2, 3, 4, 5, 6], dtype=np.int32), window=3)
    assert out[0].tolist() == [2, 5]


def test_avg_float_divisor():
    # float tiers divide by w^(m+1), no renorm (accelerated.pyx:469-599)
    out = K.avg_pool(
        np.arange(16, dtype=np.float32), window=4, num_tiers=2,
        dtype=np.float32,
    )
    assert out[0].tolist() == [1.5, 5.5, 9.5, 13.5]
    assert out[1].tolist() == [7.5]  # 120 / 16


def test_mode_float_bit_view():
    # mode pools float labels on their raw bits (pyx:1198-1231):
    # -0.0 != +0.0 and NaN == NaN, unlike value equality
    win = np.array([0.0, -0.0, -0.0, 5.0], dtype=np.float32)
    out = K.mode_pool(win, window=4)[0]
    assert out.tolist() == [-0.0]
    assert np.signbit(out)[0]  # b==c chain picked -0.0, not +0.0
    win = np.array([np.nan, np.nan, 1.0, 2.0], dtype=np.float64)
    out = K.mode_pool(win, window=4)[0]
    assert np.isnan(out[0])  # NaN bit-equal -> a==b -> NaN wins
    # plain float majority still works through the bit view
    out = K.mode_pool(np.array([7.5, 7.5, 1.0, 2.0], dtype=np.float32), 4)[0]
    assert out.tolist() == [7.5]
    # 2-D tile variant
    tile = np.array([[7.5, 1.0], [7.5, 2.0]], dtype=np.float32)
    assert K.mode_pool_2d(tile).tolist() == [[7.5]]


def test_mode_rejects_unsupported():
    with pytest.raises(TypeError):
        K.mode_pool(np.array([object()] * 4), window=4)


# ---- true 2-D tile kernels (the reference's actual 2x2 geometry) ----
# mirrors automated_test.py:256-310 cases laid out as real 2x2 patches

def test_mode_pool_2d_truth_table():
    # x = first axis: a=t[0,0], b=t[1,0], c=t[0,1], d=t[1,1]
    cases = [
        ([[0, 2], [1, 3]], 3),    # all different -> d
        ([[0, 2], [0, 3]], 0),    # a==b -> a
        ([[1, 1], [2, 3]], 1),    # a==c -> a
        ([[1, 2], [2, 3]], 2),    # b==c -> b
        ([[5, 5], [5, 5]], 5),
        ([[255, 1], [255, 2]], 255),
    ]
    for tile, expected in cases:
        out = K.mode_pool_2d(np.array(tile, dtype=np.uint8))
        assert out.tolist() == [[expected]], tile


def test_avg_pool_2d():
    tile = np.array([[1, 3], [2, 4]], dtype=np.uint8)
    assert K.avg_pool_2d(tile, dtype=np.uint8).tolist() == [[2]]  # 10>>2
    neg = np.array([[-1, -1], [-1, 0]], dtype=np.int8)
    assert K.avg_pool_2d(neg, dtype=np.int8).tolist() == [[0]]  # toward zero
    f = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    assert K.avg_pool_2d(f, dtype=np.float32).tolist() == [[2.5]]


def test_tile_kernels_vs_1d_equivalence():
    """A 2-D tile flattened in the reference's (x, y) scan order must
    pool identically to the 1-D window kernels."""
    rng = np.random.default_rng(5)
    tile = rng.integers(0, 5, size=(8, 6)).astype(np.int32)
    got2d = K.mode_pool_2d(tile)
    for i in range(4):
        for j in range(3):
            win = np.array([tile[2*i, 2*j], tile[2*i+1, 2*j],
                            tile[2*i, 2*j+1], tile[2*i+1, 2*j+1]],
                           dtype=np.int32)
            want = K.mode_pool(win, window=4)[0][0]
            assert got2d[i, j] == want


def test_tile_odd_dims_raise():
    with pytest.raises(ValueError):
        K.avg_pool_2d(np.zeros((3, 4), dtype=np.int32))
    # floats are now bit-view-pooled (pyx:1198-1231); only dtypes with
    # no unsigned view of the same width are rejected
    with pytest.raises(TypeError):
        K.mode_pool_2d(np.array([[object()] * 2] * 2))


def test_tile_multi_tier_matches_compat_pyramid():
    """2-D multi-mip tile pooling must equal the compat drop-in API's
    pyramid (itself pinned by the reference's own test suite) —
    including the tier-5 shift-8 accumulator renorm."""
    from tinybrain_spark import compat as tb

    rng = np.random.default_rng(11)
    # uint8: the accelerated multi-mip dtype (int32 multi-mip routes to
    # the reference's per-mip generic path, which truncates every tier)
    tile = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    got = K.avg_pool_2d_multi(tile, 5, dtype=np.uint8)
    want = tb.downsample_with_averaging(tile, (2, 2), num_mips=5)
    for t, (g, w) in enumerate(zip(got, want)):
        assert np.array_equal(g, w.astype(np.uint8)), f"tier {t+1}"
    got_m = K.mode_pool_2d_multi(tile, 3)
    want_m = tb.downsample_segmentation(tile, (2, 2), num_mips=3)
    for t, (g, w) in enumerate(zip(got_m, want_m)):
        assert np.array_equal(g, w), f"mode tier {t+1}"


def test_tile_multi_tier_guard():
    with pytest.raises(ValueError):
        K.avg_pool_2d_multi(np.zeros((8, 8), dtype=np.int32), 4)
