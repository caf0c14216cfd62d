"""Drop-in single-node API compatible with the reference's public
surface (tinybrain/__init__.py:1-10): the five functions a tinybrain
user calls today, over numpy ndarrays up to 4-D, implemented with this
engine's clean-room kernels.

Dispatch mirrors the reference (downsample.py:33-69, 200-247):

* ``downsample_with_averaging``: factor (2,2[,1[,1]]) / (2,2,2[,1]) run
  the accumulator kernel (multi-mip shared sums, bitshift render —
  accelerated-path semantics); other factors use the generic
  strided-accumulate float32 path with per-mip recursion and small-int
  promotion, matching downsample_with_averaging_numpy.
* ``downsample_segmentation``: (2,2[,1[,1]]) non-sparse runs the
  countless 2x2 chain with odd-edge copy (mode_pooling_2x2 semantics);
  (2,2,2[,1]) runs 8-way counting mode with clamped odd-edge neighbors;
  other power-of-two factors recurse (mode-of-modes); floats and
  non-PoT factors fall back to striding.  ``sparse`` uses the stippled
  chain with mirror padding (downsample_segmentation_2d semantics).
* ``downsample_with_striding`` / ``max_pooling`` / ``min_pooling``:
  strided slices / reduces, any factor.

Returns are lists ``[mip1, ..., mip_num_mips]`` like the reference.
"""

from __future__ import annotations

import math
from itertools import product

import numpy as np

from . import kernels as K

__all__ = [
    "DimensionError",
    "downsample_with_averaging",
    "downsample_segmentation",
    "downsample_with_striding",
    "downsample_with_max_pooling",
    "downsample_with_min_pooling",
]


class DimensionError(Exception):
    pass


def _validate_factor(array: np.ndarray, factor) -> tuple[int, ...]:
    factor = tuple(int(f) for f in np.atleast_1d(np.asarray(factor)))
    if any(f <= 0 for f in factor):
        raise ValueError(f"factors must be >= 1, got {factor}")
    return factor + (1,) * (array.ndim - len(factor))


def _to4d(img: np.ndarray) -> tuple[np.ndarray, int]:
    ndim = img.ndim
    while img.ndim < 4:
        img = img[..., np.newaxis]
    return img, ndim


def _from4d(img: np.ndarray, ndim: int) -> np.ndarray:
    while img.ndim > ndim:
        img = img[..., 0]
    return img


def _pad_edge_double(plane: np.ndarray) -> np.ndarray:
    """Duplicate trailing row/col on odd axes 0/1: the duplicated edge
    sums to 2x the lone value — the reference's odd-edge doubling
    (accelerated.hpp:66-69)."""
    pads = [(0, plane.shape[0] % 2), (0, plane.shape[1] % 2)] + [
        (0, 0)
    ] * (plane.ndim - 2)
    if any(p[1] for p in pads):
        plane = np.pad(plane, pads, mode="edge")
    return plane


def _avg_pool_2x2_nd(img: np.ndarray, num_mips: int, sparse: bool,
                     pool_z: bool) -> list[np.ndarray]:
    """Accumulator multi-mip 2x2[x2] average over axes 0,1[,2] of a 4-D
    image — accelerated_avg semantics (accelerated.pyx:197-1150)."""
    dt = img.dtype
    is_float = dt.kind == "f"
    acc_dt = dt if is_float else (np.int64 if dt.kind == "i" else np.uint64)
    window = 8 if pool_z else 4
    log2w = 3 if pool_z else 2
    cycle = K._cycle(window, dt)

    min_plane = min(img.shape[:3] if pool_z else img.shape[:2])
    if min_plane < 2**num_mips:
        raise ValueError(
            "Can't downsample smaller than the smallest plane dimension."
        )

    def block_sum(arr):
        arr = _pad_edge_double(arr)
        if pool_z and arr.shape[2] % 2:
            arr = np.pad(arr, [(0, 0), (0, 0), (0, 1), (0, 0)], mode="edge")
        s = (
            arr[0::2, 0::2] + arr[1::2, 0::2] + arr[0::2, 1::2] + arr[1::2, 1::2]
        )
        if pool_z:
            s = s[:, :, 0::2] + s[:, :, 1::2]
        return s

    accum = block_sum(img.astype(acc_dt))
    denom = None
    if sparse:
        denom = block_sum((img != 0).astype(acc_dt))

    results = []
    for m in range(num_mips):
        shift = log2w * ((m % cycle) + 1)
        if sparse:
            if is_float:
                out = np.where(denom == 0, 0, accum / np.maximum(denom, 1))
            else:
                out = np.where(
                    denom == 0, 0, K._trunc_div(accum, np.maximum(denom, 1))
                )
            results.append(out.astype(dt))
        elif is_float:
            results.append((accum / float(window) ** (m + 1)).astype(dt))
        else:
            results.append(K._render_int(accum, shift, dt))
        if m == num_mips - 1:
            break
        if not is_float and shift == log2w * cycle:
            accum = accum >> shift
            if sparse and window == 8:
                denom = denom >> shift
        accum = block_sum(accum)
        if sparse:
            denom = block_sum(denom)
    return results


def _avg_generic(img: np.ndarray, factor, sparse: bool) -> np.ndarray:
    """Generic strided accumulate/divide in float32 temp — the
    reference's numpy fallback semantics (downsample.py:118-145)."""
    factor = _validate_factor(img, factor)
    if all(f == 1 for f in factor[:3]):
        return img
    out_shape = tuple(
        int(math.ceil(s / f)) for s, f in zip(img.shape, factor)
    )
    temp = np.zeros(out_shape, dtype=np.float32)
    counts = np.zeros(out_shape, dtype=np.int64)
    for offset in product(*(range(f) for f in factor)):
        part = img[tuple(slice(o, None, f) for o, f in zip(offset, factor))]
        region = tuple(slice(0, s) for s in part.shape)
        temp[region] += part
        counts[region] += (part != 0) if sparse else 1
    if sparse:
        np.maximum(counts, 1, out=counts)
    return np.asarray(temp / counts, dtype=img.dtype)


def downsample_with_averaging(img, factor, num_mips=1, sparse=False):
    img = np.asarray(img)
    factor = tuple(int(f) for f in np.atleast_1d(np.asarray(factor)))
    fast_dtype = img.dtype in (
        np.int8, np.int16, np.uint8, np.uint16, np.float32, np.float64,
    )
    if fast_dtype or num_mips == 1:
        if factor in ((2, 2), (2, 2, 1), (2, 2, 1, 1)):
            img4, ndim = _to4d(img)
            mips = _avg_pool_2x2_nd(img4, num_mips, sparse, pool_z=False)
            return [_from4d(m, ndim) for m in mips]
        if factor in ((2, 2, 2), (2, 2, 2, 1)):
            img4, ndim = _to4d(img)
            mips = _avg_pool_2x2_nd(img4, num_mips, sparse, pool_z=True)
            return [_from4d(m, ndim) for m in mips]

    results = []
    if np.dtype(img.dtype).itemsize < 4 and img.dtype.kind != "f":
        dt = img.dtype
        cur = img.astype(np.float32)
        for _ in range(num_mips):
            cur = _avg_generic(cur, factor, sparse)
            results.append(cur.astype(dt))
    else:
        cur = img
        for _ in range(num_mips):
            cur = _avg_generic(cur, factor, sparse)
            results.append(cur)
    return results


def _mode_2x2_plane(plane: np.ndarray, sparse: bool) -> np.ndarray:
    """One 2x2 mode pass over axes 0,1 of a 4-D block; odd edges copy
    the lone input pixel (mode_pooling_2x2, accelerated.hpp:1046-1057)."""
    sx, sy = plane.shape[0], plane.shape[1]
    osx, osy = (sx + 1) // 2, (sy + 1) // 2
    ex, ey = sx - (sx % 2), sy - (sy % 2)
    # np.ndindex window order (a,b,c,d) = (0,0),(0,1),(1,0),(1,1) — the
    # numpy countless/stippled order (downsample.py:336-340).  Dense
    # countless is invariant to swapping b/c, so this also reproduces the
    # C++ kernel's results; the stippled first-nonzero fallback is NOT
    # invariant, and the reference's sparse path is the numpy one.
    a = plane[0:ex:2, 0:ey:2]
    b = plane[0:ex:2, 1:ey:2]
    c = plane[1:ex:2, 0:ey:2]
    d = plane[1:ex:2, 1:ey:2]
    if sparse:
        pair = np.where((a == b) & (a != 0) | (a == c) & (a != 0), a, 0)
        pair = np.where((pair == 0) & (b == c) & (b != 0), b, pair)
        nonzero = np.where(a != 0, a, np.where(b != 0, b, c))
        core = np.where(pair != 0, pair, np.where(d != 0, d, nonzero))
    else:
        core = np.where((a == b) | (a == c), a, np.where(b == c, b, d))
    out = np.empty((osx, osy) + plane.shape[2:], dtype=plane.dtype)
    out[: ex // 2, : ey // 2] = core
    if sx % 2:
        out[-1, : ey // 2] = plane[-1, 0:ey:2]
    if sy % 2:
        out[: ex // 2, -1] = plane[0:ex:2, -1]
    if sx % 2 and sy % 2:
        out[-1, -1] = plane[-1, -1]
    return out


def _mode_2x2x2(
    block: np.ndarray,
    sparse: bool,
    fallback_last: bool = False,
    ndindex_order: bool = False,
) -> np.ndarray:
    """8-way counting mode over axes 0,1,2 with clamped odd-edge
    neighbor offsets (accelerated.hpp:1069-1149).  ``fallback_last``
    selects the numpy countless3d fallback (no-repeat window -> last
    element, downsample.py:456) used on the planner path."""
    sx, sy, sz = block.shape[:3]

    def grab(dx, dy, dz):
        ix = np.minimum(np.arange(0, sx, 2) + dx, sx - 1)
        iy = np.minimum(np.arange(0, sy, 2) + dy, sy - 1)
        iz = np.minimum(np.arange(0, sz, 2) + dz, sz - 1)
        return block[np.ix_(ix, iy, iz)]

    if ndindex_order:
        # numpy countless section order: np.ndindex((2,2,2)) — z fastest
        # (downsample.py:421-423); tie-breaks follow this ordering
        vals = [grab(dx, dy, dz)
                for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    else:
        # accelerated scan order: x fastest, then y, then z (hpp:1095-1102)
        vals = [grab(dx, dy, dz)
                for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    win = np.stack(vals, axis=-1)
    flat = win.reshape(-1, 8)
    if fallback_last:
        out = _countless_mode8_exact(flat)
    else:
        out = K._mode8_one(flat[np.newaxis, :, :], sparse)[0]
    return out.reshape(win.shape[:-1]).astype(block.dtype)


def _countless_mode8_exact(flat: np.ndarray) -> np.ndarray:
    """Exact generalized-countless mode over 8-value windows in ndindex
    order (downsample.py:394-458).  Differs from the accelerated kernel
    in two documented ways: (a) the r=2 level skips pairs that touch the
    LAST section (`combinations(range(len(sections)-1), 2)`,
    downsample.py:430) — a value occurring only at {x, 7} is invisible
    until the fallback; (b) windows with no qualifying combination fall
    back to the LAST element, not the first.

    flat: (n, 8) ndindex-ordered windows -> (n,) winners.
    """
    n = flat.shape[0]
    counts = np.zeros((n, 8), dtype=np.int8)
    counts7 = np.zeros((n, 8), dtype=np.int8)
    for t in range(8):
        eq = flat == flat[:, t : t + 1]
        counts[:, t] = eq.sum(axis=1, dtype=np.int8)
        counts7[:, t] = eq[:, :7].sum(axis=1, dtype=np.int8)
    level = np.where(
        counts >= 3,
        np.minimum(counts, 4),
        np.where((counts == 2) & (counts7 >= 2), 2, 0),
    ).astype(np.int8)
    best = np.argmax(level, axis=1)  # first slot at max level
    out = np.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    no_combo = level.max(axis=1) == 0
    return np.where(no_combo, flat[:, 7], out)


def _odd_to_even_mirror(plane: np.ndarray) -> np.ndarray:
    """Duplicate the TRAILING row/col on odd axes 0/1.  odd_to_even2d's
    docstring claims a leading mirror ('[3,2,4] -> [3,3,2,4]') but the
    code places the image at the start and copies the LAST row/col into
    the pad (downsample.py:106-114) — we match the code, not the
    docstring."""
    pads = [(0, plane.shape[0] % 2), (0, plane.shape[1] % 2)] + [
        (0, 0)
    ] * (plane.ndim - 2)
    if any(p[1] for p in pads):
        plane = np.pad(plane, pads, mode="edge")
    return plane


def _segmentation_planner(data: np.ndarray, factor, sparse: bool) -> np.ndarray:
    """The reference's numpy planner (_downsample_segmentation,
    downsample.py:249-270)."""
    factor = np.asarray(factor, dtype=float)
    if np.all(factor == 1):
        return data
    if data.dtype.kind not in ("u", "i"):
        return downsample_with_striding(
            data, tuple(int(f) for f in factor), num_mips=1
        )[0]

    def is_pot(x):
        return x > 1 and not (math.log2(x) % 1)

    prod = float(np.prod(factor))
    twod = bool(np.any(factor == 1)) and is_pot(prod)
    threed = not np.any(factor == 1) and is_pot(prod)
    shape3 = np.array(data.shape[:3])
    if threed and (shape3 % 2).sum() == 0:
        # reference planner routes through countless3d, which ignores
        # sparse and falls back to the LAST voxel on no-repeat windows
        # (downsample.py:264-265, 383-392)
        return _segmentation_planner(
            _mode_2x2x2(data, sparse=False, fallback_last=True,
                        ndindex_order=True),
            factor / 2,
            sparse,
        )
    if not twod:
        return downsample_with_striding(
            data, tuple(int(f) for f in factor), num_mips=1
        )[0]
    # 2-D PoT: axis-swap so the preserved axis is z, mirror-pad, pool
    preserved = int(np.where(factor == 1)[0][0])
    data = np.swapaxes(data, preserved, 2)
    data = _odd_to_even_mirror(data)
    pooled = _mode_2x2_plane(data, sparse)
    pooled = np.swapaxes(pooled, preserved, 2)
    nf = factor / 2
    nf[preserved] = 1
    return _segmentation_planner(pooled, nf, sparse)


def downsample_segmentation(img, factor, sparse=False, num_mips=1):
    img = np.asarray(img)
    factor = tuple(int(f) for f in np.atleast_1d(np.asarray(factor)))
    if all(f == 1 for f in factor):
        return [img] * num_mips

    # the accelerated mode kernels pool float32/float64/csingle on their
    # raw bits (accelerated.pyx:1214,1222 and the 2x2x2 dispatch): NaN
    # windows compare bit-equal, -0.0 != +0.0.  Any OTHER float/complex
    # dtype (float16, complex128) has no dispatch case and raises
    # ValueError in the reference — do the same rather than silently
    # pooling it.  Only the fast factors take this path; the numpy
    # planner routes floats to striding (downsample.py:253-254).
    if img.dtype.kind in "fc" and factor in (
        (2, 2), (2, 2, 1), (2, 2, 1, 1), (2, 2, 2), (2, 2, 2, 1)
    ) and not (sparse and factor in ((2, 2), (2, 2, 1), (2, 2, 1, 1))):
        if img.dtype not in (np.float32, np.float64, np.csingle):
            raise ValueError("{} not supported.".format(img.dtype))
        mips = downsample_segmentation(
            K._bit_view(img), factor, sparse=sparse, num_mips=num_mips
        )
        return [m.view(img.dtype) for m in mips]

    if factor in ((2, 2), (2, 2, 1), (2, 2, 1, 1)) and not sparse:
        img4, ndim = _to4d(img)
        results = []
        cur = img4
        for _ in range(num_mips):
            cur = _mode_2x2_plane(cur, sparse=False)
            results.append(_from4d(cur, ndim))
        return results
    if factor in ((2, 2, 2), (2, 2, 2, 1)):
        img4, ndim = _to4d(img)
        results = []
        cur = img4
        for _ in range(num_mips):
            cur = _mode_2x2x2(cur, sparse)
            results.append(_from4d(cur, ndim))
        return results

    img4, ndim = _to4d(img)
    results = []
    cur = img4
    for _ in range(num_mips):
        cur = _segmentation_planner(cur, np.asarray(factor, dtype=float), sparse)
        results.append(_from4d(cur, ndim))
    return results


def downsample_with_striding(array, factor, num_mips=1):
    array = np.asarray(array)
    ndim = array.ndim
    array4, _ = _to4d(array)
    factor = _validate_factor(array4, factor)
    if all(f == 1 for f in factor):
        return []
    results = []
    cur = array4
    for _ in range(num_mips):
        cur = cur[tuple(slice(None, None, f) for f in factor)]
        results.append(_from4d(cur, ndim))
    return results


def _reduce_pool_nd(array, factor, num_mips, fn):
    array = np.asarray(array)
    factor = _validate_factor(array, factor)
    results = []
    cur = array
    for _ in range(num_mips):
        if all(f == 1 for f in factor):
            results.append(cur)
            continue
        sections = [
            cur[tuple(slice(o, None, f) for o, f in zip(offset, factor))]
            for offset in product(*(range(f) for f in factor))
        ]
        out = sections[0].copy()
        for part in sections[1:]:
            region = tuple(slice(0, s) for s in part.shape)
            out[region] = fn(out[region], part)
        cur = out
        results.append(cur)
    return results


def downsample_with_max_pooling(array, factor, num_mips=1):
    return _reduce_pool_nd(array, factor, num_mips, np.maximum)


def downsample_with_min_pooling(array, factor, num_mips=1):
    return _reduce_pool_nd(array, factor, num_mips, np.minimum)
