"""Drop-in API parity: tinybrain_spark.compat vs the actual reference
numpy implementations (loaded from /root/reference like
test_reference_parity), on the reference's own call shapes — 2-D/3-D/
4-D ndarrays, factor tuples, num_mips, sparse."""

import os

import numpy as np
import pytest

from tinybrain_spark import compat as C

from test_reference_parity import ref  # noqa: F401  (fixture reuse)

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/tinybrain"),
    reason="reference repo not available",
)

RNG = np.random.default_rng(77)


# ---- averaging: generic numpy path (odd factors / wide dtypes) --------

@pytest.mark.parametrize("shape,factor", [
    ((12, 12, 3), (3, 3, 1)),
    ((10, 8, 4), (2, 4, 1)),
    ((9, 9, 2), (3, 3, 2)),
])
@pytest.mark.parametrize("sparse", [False, True])
def test_avg_generic_matches_reference(ref, shape, factor, sparse):
    img = RNG.integers(0, 200, size=shape).astype(np.uint32)
    if sparse:
        img = np.where(RNG.random(shape) < 0.5, 0, img).astype(np.uint32)
    want = ref.downsample_with_averaging_numpy(img, factor, sparse=sparse)
    got = C.downsample_with_averaging(img, factor, num_mips=1, sparse=sparse)[0]
    np.testing.assert_array_equal(got, want)


def test_avg_generic_multimip_small_int_promotion(ref):
    """<4-byte ints promote to float32 across mips (downsample.py:58-63)."""
    img = RNG.integers(0, 255, size=(16, 16, 2)).astype(np.uint8)
    cur = img.astype(np.float32)
    want = []
    for _ in range(2):
        cur = ref.downsample_with_averaging_numpy(cur, (4, 4, 1), sparse=False)
        want.append(cur.astype(np.uint8))
    got = C.downsample_with_averaging(img, (4, 4, 1), num_mips=2)
    # (4,4,1) is not a fast-path factor, so the generic recursion runs
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_avg_2x2_single_mip_matches_numpy_on_even(ref):
    """The accumulator fast path equals the numpy oracle at mip 1 on
    even shapes (the reference's own differential invariant,
    automated_test.py:128-148)."""
    for dt in (np.uint8, np.int16, np.float32):
        img = RNG.integers(0, 200, size=(64, 32, 4)).astype(dt)
        want = ref.downsample_with_averaging_numpy(img, (2, 2, 1))
        got = C.downsample_with_averaging(img, (2, 2, 1), num_mips=1)[0]
        if np.dtype(dt).kind == "f":
            np.testing.assert_allclose(got, want, rtol=1e-6)
        else:
            np.testing.assert_array_equal(got, want)


def test_avg_2x2_four_mip_truncation_invariant():
    """mips[3] equals the one-shot 16x16 average (automated_test.py:145)."""
    img = RNG.integers(0, 255, size=(64, 64)).astype(np.uint8)
    mips = C.downsample_with_averaging(img, (2, 2), num_mips=4)
    blocks = img.astype(np.int64).reshape(4, 16, 4, 16).transpose(0, 2, 1, 3)
    want = (blocks.reshape(4, 4, 256).sum(axis=2) >> 8).astype(np.uint8)
    np.testing.assert_array_equal(mips[3], want)


def test_avg_2x2x2_matches_generic_single_mip(ref):
    img = RNG.integers(0, 200, size=(16, 16, 8)).astype(np.uint16)
    want = ref.downsample_with_averaging_numpy(img, (2, 2, 2))
    got = C.downsample_with_averaging(img, (2, 2, 2), num_mips=1)[0]
    np.testing.assert_array_equal(got, want)


def test_avg_min_plane_guard():
    img = RNG.integers(0, 9, size=(4, 4)).astype(np.uint8)
    with pytest.raises(ValueError):
        C.downsample_with_averaging(img, (2, 2), num_mips=3)


# ---- segmentation / mode ----------------------------------------------

def test_seg_2x2_even_matches_reference_planner(ref):
    img = (RNG.integers(0, 10, size=(64, 64, 3))).astype(np.uint32)
    want = ref.downsample_segmentation_2d(
        img[..., np.newaxis] if img.ndim == 3 else img, np.array((2, 2, 1)), False
    )
    got = C.downsample_segmentation(img, (2, 2, 1), num_mips=1)[0]
    np.testing.assert_array_equal(got, np.squeeze(want))


def test_seg_4x_recursion_matches_reference(ref):
    img = (RNG.integers(0, 6, size=(32, 32, 2))).astype(np.uint64)
    want = ref.downsample_segmentation_2d(
        img[..., np.newaxis], np.array((4, 4, 1)), False
    )
    got = C.downsample_segmentation(img, (4, 4, 1), num_mips=1)[0]
    np.testing.assert_array_equal(got, np.squeeze(want))


@pytest.mark.parametrize("shape", [(33, 32, 2), (32, 33, 2), (33, 33, 2)])
def test_seg_sparse_odd_matches_reference(ref, shape):
    img = (RNG.integers(0, 5, size=shape)).astype(np.uint32)
    want = ref.downsample_segmentation_2d(
        img[..., np.newaxis], np.array((2, 2, 1)), True
    )
    got = C.downsample_segmentation(img, (2, 2, 1), sparse=True, num_mips=1)[0]
    np.testing.assert_array_equal(got, np.squeeze(want))


def test_seg_4x4x4_matches_reference_planner(ref):
    """(4,4,4) routes through countless3d recursion in BOTH impls
    (the accelerated (2,2,2) kernel differs from countless3d only in
    the no-repeat fallback: first vs last element)."""
    img = (RNG.integers(0, 20, size=(16, 16, 16))).astype(np.uint32)
    want = ref.downsample_segmentation(img, (4, 4, 4), num_mips=1)[0]
    got = C.downsample_segmentation(img, (4, 4, 4), num_mips=1)[0]
    np.testing.assert_array_equal(got, want)


def test_countless3d_no_repeat_fallback(ref):
    """All-distinct window: countless3d yields the LAST voxel."""
    img = np.arange(8, dtype=np.uint32).reshape(2, 2, 2)
    want = ref.countless3d(img.copy())
    from tinybrain_spark.compat import _mode_2x2x2
    got = _mode_2x2x2(img, sparse=False, fallback_last=True)
    np.testing.assert_array_equal(got, want)


def test_seg_float_falls_back_to_striding(ref):
    img = RNG.random((16, 16, 2)).astype(np.float32)
    got = C.downsample_segmentation(img, (3, 3, 1), num_mips=1)[0]
    want = ref.downsample_with_striding(img, (3, 3, 1), num_mips=1)[0]
    np.testing.assert_array_equal(got, want)


def test_seg_identity_factor():
    img = RNG.integers(0, 5, size=(8, 8)).astype(np.uint8)
    out = C.downsample_segmentation(img, (1, 1), num_mips=3)
    assert len(out) == 3
    for o in out:
        np.testing.assert_array_equal(o, img)


# ---- striding / max / min ----------------------------------------------

@pytest.mark.parametrize("factor", [(2, 2, 1), (3, 1, 2), (4, 4, 4)])
def test_striding_matches_reference(ref, factor):
    img = RNG.integers(0, 100, size=(17, 12, 9)).astype(np.int32)
    want = ref.downsample_with_striding(img, factor, num_mips=2)
    got = C.downsample_with_striding(img, factor, num_mips=2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.parametrize("factor", [(2, 2), (2, 2, 1), (3, 2, 1)])
def test_max_min_match_reference(ref, factor):
    # shapes divisible by factor^2 — the reference's strided reduce
    # raises on ragged sections (downsample.py:195-196)
    img = RNG.integers(-50, 50, size=(36, 16, 4)).astype(np.int16)
    for mine, theirs in [
        (C.downsample_with_max_pooling, ref.downsample_with_max_pooling),
        (C.downsample_with_min_pooling, ref.downsample_with_min_pooling),
    ]:
        got = mine(img, factor, num_mips=2)
        want = theirs(img, factor, num_mips=2)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)


def test_segmentation_float_bit_view():
    """Fast-factor mode pooling accepts float labels via raw-bit
    reinterpretation (accelerated.pyx:1198-1231, 1271-1296): NaN windows
    compare bit-equal and -0.0 != +0.0."""
    import numpy as np

    from tinybrain_spark import compat as tb

    img = np.array(
        [[0.0, -0.0], [-0.0, 5.0]], dtype=np.float32
    )
    out = tb.downsample_segmentation(img, (2, 2))[0]
    # b==c (-0.0 bits) wins over value-equality a==b (0.0 == -0.0)
    assert np.signbit(out.ravel()[0])
    img = np.array([[np.nan, np.nan], [1.0, 2.0]], dtype=np.float64)
    out = tb.downsample_segmentation(img, (2, 2))[0]
    assert np.isnan(out.ravel()[0])
    # 2x2x2 counting mode on float bits
    img3 = np.full((2, 2, 2), 3.5, dtype=np.float32)
    img3[1, 1, 1] = 9.0
    out = tb.downsample_segmentation(img3, (2, 2, 2))[0]
    assert out.ravel()[0] == 3.5


def test_segmentation_float16_raises_like_reference():
    """The reference's mode_pooling dispatch lists float32/float64/
    csingle only (accelerated.pyx:1214,1222); float16 has no case and
    raises ValueError.  Non-fast factors route float16 to striding via
    the planner (downsample.py:253-254) — both pinned here."""
    import numpy as np
    import pytest

    from tinybrain_spark import compat as tb

    img = np.arange(16, dtype=np.float16).reshape(4, 4)
    with pytest.raises(ValueError, match="not supported"):
        tb.downsample_segmentation(img, (2, 2))
    with pytest.raises(ValueError, match="not supported"):
        tb.downsample_segmentation(
            np.zeros((2, 2, 2), dtype=np.float16), (2, 2, 2)
        )
    # sparse 2d + non-fast factors bypass the accelerated dispatch and
    # stride, exactly like the reference planner
    got = tb.downsample_segmentation(img, (2, 2), sparse=True)[0]
    np.testing.assert_array_equal(got, img[::2, ::2])
    got = tb.downsample_segmentation(img, (4, 4))[0]
    np.testing.assert_array_equal(got, img[::4, ::4])
