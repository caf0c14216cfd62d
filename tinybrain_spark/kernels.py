"""Clean-room numpy pooling kernels — the single-node semantic reference.

Recasts tinybrain's mip-pyramid pooling kernels (reference:
``/root/reference/tinybrain/accelerated.pyx``,
``/root/reference/tinybrain/accelerated.hpp``,
``/root/reference/tinybrain/downsample.py``) from dense 2-D/3-D images to
1-D token sequences: a "2x2 patch" becomes a window of 4 consecutive
tokens, a "2x2x2 cuboid" a window of 8, and a mip level becomes a
retention tier.  Semantics are byte-matched; the implementation is
original vectorized numpy (no code copied).

Semantic invariants replicated from the reference
-------------------------------------------------
* AVG multi-tier (accelerated.pyx:197-263): keep a widened running
  accumulator of ORIGINAL values; render tier m as
  ``accum >> log2(w) * ((m % cycle) + 1)``; renormalize the accumulator
  (shift it right) only when the bitshift hits the cycle boundary —
  i.e. exact ``floor(blocksum / w^(m+1))`` for the first `cycle` tiers.
  Cycles: w=4 → 4 (pyx:224); w=8 → 8 for 8-bit (pyx:742), 5 for 16-bit
  (pyx:910).
* Signed render rounds toward zero: ``-(abs(a) >> shift)`` for negative
  accumulators (accelerated.hpp:934-939, render_image).
* Float tiers divide by ``w^(m+1)`` with no renormalization
  (accelerated.pyx:497,563,1065).
* Sparse AVG keeps a parallel nonzero-count accumulator;
  ``denom == 0 -> 0`` else C-style truncating division
  (accelerated.hpp:948-958, render_image_sparse).  Quirk replicated: the
  w=4 path never renormalizes the denominator at the cycle boundary
  (pyx:240-259) while the w=8 path does (pyx:758-761).
* MODE w=4 tie-break: ``a==b -> a; a==c -> a; b==c -> b; else d``
  (accelerated.hpp:1023-1042, countless chain).
* Stippled (sparse) MODE w=4: zeros are background; countless result,
  else d, else first nonzero of a,b,c (downsample.py:355-381).
* MODE w=8: max count wins, ties -> earliest value in scan order,
  count >= 4 is an instant win (equivalent), sparse skips zeros and an
  all-zero window yields 0 (accelerated.hpp:1069-1149).
* Multi-tier mode is mode-of-modes — recursive, acknowledged lossy
  (downsample.py:215-217).
* Max/min/stride: plain strided reduce / slice
  (downsample.py:147-198,485-506).
* Edge rule for partial trailing windows: cyclic repetition of the
  partial window — generalizes the reference's odd-edge doubling for
  AVG (accelerated.hpp:66-69 "double values to prevent darkening") and
  reduces to lone-pixel copy for the corner case.  MODE partial windows
  copy the first element (reference odd-edge replication,
  accelerated.hpp:1046-1057).
* Minimum-size guard: ``n < w**num_tiers`` raises ValueError
  (accelerated.pyx:89-90).

All kernels take a 2-D batch ``(n_rows, n_tok)`` (or 1-D, auto-expanded)
and return a list of per-tier 2-D arrays, mirroring the reference's
"list of mips" return shape (downsample.py:45).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "avg_pool",
    "avg_pool_generic",
    "mode_pool",
    "max_pool",
    "min_pool",
    "stride_pool",
    "pool",
    "out_len",
    "validate_pool_args",
]

_LOG2 = {2: 1, 4: 2, 8: 3}

# (window -> dtype-kind cycle): after `cycle` tiers the accumulator is
# renormalized, costing one truncation per cycle. Reference values:
# accelerated.pyx:224 (w=4 all dtypes: 4), :742 (w=8 8-bit: 8),
# :910 (w=8 16-bit: 5). Wider engine dtypes (int32/int64) reuse the
# deepest reference cycle for their window.
def _cycle(window: int, dtype: np.dtype) -> int:
    if window == 8 and dtype.itemsize == 2:
        return 5
    if window == 8:
        return 8
    if window == 4:
        return 4
    return 8  # w=2 engine extension: renorm every 8 tiers (shift 8)


def out_len(n: int, window: int) -> int:
    """Output length of one pooling tier: ceil(n / window)."""
    return -(-n // window)


def validate_pool_args(
    n_tok: int, window: int, num_tiers: int, pot_only: bool = True
) -> None:
    """``pot_only`` pins the accumulator/mode kernels to the reference's
    accelerated windows {2,4,8}; the generic paths (avg_pool_generic,
    max/min/stride — reference downsample.py:118-198,485-506 accept any
    factor) take any window >= 2."""
    if pot_only and window not in (2, 4, 8):
        raise ValueError(f"window must be 2, 4 or 8, got {window}")
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if num_tiers < 1:
        raise ValueError(f"num_tiers must be >= 1, got {num_tiers}")
    if n_tok < window**num_tiers:
        # reference: accelerated.pyx:89-90
        raise ValueError(
            f"Can't downsample below one window: n_tok={n_tok} < "
            f"{window}**{num_tiers}"
        )


def _as_batch(tokens: np.ndarray) -> tuple[np.ndarray, bool]:
    arr = np.asarray(tokens)
    if arr.ndim == 1:
        return arr[np.newaxis, :], True
    if arr.ndim == 2:
        return arr, False
    raise ValueError(f"tokens must be 1-D or 2-D, got ndim={arr.ndim}")


def _cyclic_pad(batch: np.ndarray, window: int) -> np.ndarray:
    """Pad the trailing partial window by cyclic repetition.

    [..., x, y] with window 4 -> [..., x, y, x, y]: the sum doubles, so
    rendering with the full-window shift yields the mean of {x, y} —
    the reference's odd-edge doubling rule (accelerated.hpp:66-69).
    """
    n = batch.shape[1]
    rem = n % window
    if rem == 0:
        return batch
    pad = window - rem
    tail = batch[:, n - rem :]
    reps = -(-pad // rem)
    pad_block = np.tile(tail, (1, reps))[:, :pad]
    return np.concatenate([batch, pad_block], axis=1)


def _windows(batch: np.ndarray, window: int) -> np.ndarray:
    """(rows, n) -> (rows, n_out, window) view over cyclic-padded input."""
    padded = _cyclic_pad(batch, window)
    rows, n = padded.shape
    return padded.reshape(rows, n // window, window)


def _render_int(accum: np.ndarray, shift: int, out_dtype: np.dtype) -> np.ndarray:
    """render_image (accelerated.hpp:932-946): >> for unsigned, signed
    rounds toward zero via -(abs(a) >> shift)."""
    if np.issubdtype(accum.dtype, np.signedinteger):
        out = np.where(accum < 0, -(np.abs(accum) >> shift), accum >> shift)
    else:
        out = accum >> shift
    return out.astype(out_dtype)


def _trunc_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """C-style truncating integer division with positive denominator."""
    if np.issubdtype(num.dtype, np.signedinteger):
        return np.where(num < 0, -(np.abs(num) // den), num // den)
    return num // den


def avg_pool(
    tokens: np.ndarray,
    window: int = 4,
    num_tiers: int = 1,
    sparse: bool = False,
    dtype: np.dtype | type | None = None,
) -> list[np.ndarray]:
    """Multi-tier average pooling with a shared widened accumulator.

    Integer dtypes render ``accum >> log2(w)*((m % cycle)+1)`` from a
    running block-sum of original values (exact for the first `cycle`
    tiers); floats divide by ``w^(m+1)``.  ``sparse`` divides by the
    count of nonzero original values instead (0 where the count is 0).
    Mirrors reference accelerated.pyx:82-599 (2x2) / :603-1150 (2x2x2).
    """
    batch, squeeze = _as_batch(tokens)
    dt = np.dtype(dtype) if dtype is not None else batch.dtype
    batch = batch.astype(dt, copy=False)
    validate_pool_args(batch.shape[1], window, num_tiers)

    is_float = np.issubdtype(dt, np.floating)
    if is_float:
        acc_dt = dt  # reference accumulates floats in the same type (pyx:469-599)
    elif np.issubdtype(dt, np.signedinteger):
        acc_dt = np.int64
    else:
        acc_dt = np.uint64

    log2w = _LOG2[window]
    cycle = _cycle(window, dt)

    accum = _windows(batch.astype(acc_dt), window).sum(axis=2, dtype=acc_dt)
    denom = None
    if sparse:
        nz = (batch != 0).astype(acc_dt)
        denom = _windows(nz, window).sum(axis=2, dtype=acc_dt)

    results: list[np.ndarray] = []
    for m in range(num_tiers):
        shift = log2w * ((m % cycle) + 1)
        if sparse:
            if is_float:
                out = np.where(denom == 0, 0, accum / np.maximum(denom, 1))
                results.append(out.astype(dt))
            else:
                out = np.where(denom == 0, 0, _trunc_div(accum, np.maximum(denom, 1)))
                results.append(out.astype(dt))
        elif is_float:
            results.append((accum / float(window) ** (m + 1)).astype(dt))
        else:
            results.append(_render_int(accum, shift, dt))

        if m == num_tiers - 1:
            break

        if not is_float and shift == log2w * cycle:
            # renormalize at the cycle boundary (pyx:240-241, 758-761)
            accum = accum >> shift
            if sparse and window == 8:
                # the w=8 path shifts the denominator too (pyx:758-761);
                # the w=4 path does NOT (pyx:240-259) — quirk replicated
                denom = denom >> shift

        accum = _windows(accum, window).sum(axis=2, dtype=acc_dt)
        if sparse:
            denom = _windows(denom, window).sum(axis=2, dtype=acc_dt)

    return [r[0] if squeeze else r for r in results]


def avg_pool_generic(
    tokens: np.ndarray,
    window: int,
    num_tiers: int = 1,
    sparse: bool = False,
) -> list[np.ndarray]:
    """Arbitrary-window average pooling — the reference's numpy generic
    path (downsample.py:118-145, per-mip recursion downsample.py:57-69):
    accumulate strided offset slices into a float32 temp, divide by the
    (nonzero-)count, cast back to the input dtype each tier.  Trailing
    partial windows average over the elements actually present.  Unlike
    the accelerated path, truncation happens EVERY tier (no shared
    accumulator) — the reference accepts this for non-{2,4,8} factors."""
    batch, squeeze = _as_batch(tokens)
    validate_pool_args(batch.shape[1], window, num_tiers, pot_only=False)
    dt = batch.dtype
    results: list[np.ndarray] = []
    cur = batch
    for _ in range(num_tiers):
        rows, n = cur.shape
        n_out = out_len(n, window)
        temp = np.zeros((rows, n_out), dtype=np.float32)
        counts = np.zeros((rows, n_out), dtype=np.int64)
        for o in range(window):
            part = cur[:, o::window]
            wpart = part.shape[1]
            temp[:, :wpart] += part
            counts[:, :wpart] += (part != 0) if sparse else 1
        if sparse:
            np.maximum(counts, 1, out=counts)
        cur = np.asarray(temp / counts, dtype=dt)
        results.append(cur)
    return [r[0] if squeeze else r for r in results]


def _mode4_one(win: np.ndarray) -> np.ndarray:
    """(rows, n_out, 4) -> (rows, n_out): countless tie-break chain."""
    a, b, c, d = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    return np.where(
        (a == b) | (a == c), a, np.where(b == c, b, d)
    ).astype(win.dtype)


def _stippled4_one(win: np.ndarray) -> np.ndarray:
    """Sparse countless: zeros are background, lone pixels inflate
    (downsample.py:355-381).  out = AB||AC||BC || D || first-nonzero."""
    a, b, c, d = win[..., 0], win[..., 1], win[..., 2], win[..., 3]
    pair = np.where((a == b) & (a != 0) | (a == c) & (a != 0), a, 0)
    pair = np.where((pair == 0) & (b == c) & (b != 0), b, pair)
    nonzero = np.where(a != 0, a, np.where(b != 0, b, c))
    fallback = np.where(d != 0, d, nonzero)
    return np.where(pair != 0, pair, fallback).astype(win.dtype)


def _mode8_one(
    win: np.ndarray, sparse: bool, fallback_last: bool = False
) -> np.ndarray:
    """(rows, n_out, 8) -> (rows, n_out): counting mode, first scan-order
    occurrence wins ties (accelerated.hpp:1069-1149).

    ``fallback_last`` replicates the numpy countless3d fallback instead:
    a window with NO repeated value yields its LAST element
    (downsample.py:456 ``lor(reduce(lor, results), sections[-1])``),
    whereas the accelerated kernel yields the first.

    Instant-majority fast path (reference O4, hpp:1106-1115 — "~4x on
    real connectomics"): uniform windows skip counting entirely.  Label
    data is heavily run-length (the kernel's actual use case); the path
    engages only when sampling shows enough uniform windows, so random
    data keeps the plain vectorized counting (result identical either
    way — a uniform window's mode is its value under every tie-break).
    """
    first = win[..., :1]
    uniform = (win == first).all(axis=-1)
    if uniform.size and uniform.mean() > 0.2:
        out = np.empty(win.shape[:-1], dtype=win.dtype)
        out[uniform] = first[..., 0][uniform]
        rest = ~uniform
        if rest.any():
            out[rest] = _mode8_count(
                win[rest][np.newaxis], sparse, fallback_last
            )[0]
        return out
    return _mode8_count(win, sparse, fallback_last)


def _mode8_count(
    win: np.ndarray, sparse: bool, fallback_last: bool = False
) -> np.ndarray:
    w = win.shape[-1]
    counts = np.zeros(win.shape, dtype=np.int8)
    for t in range(w):
        eq = (win == win[..., t : t + 1]).sum(axis=-1, dtype=np.int8)
        counts[..., t] = eq
    if sparse:
        counts = np.where(win == 0, np.int8(-1), counts)
    # np.argmax returns the FIRST index achieving the max -> the earliest
    # scan-order occurrence of the winning value, exactly the reference's
    # tie-break (and its count>=4 instant win is equivalent).
    best = np.argmax(counts, axis=-1)
    if fallback_last:
        no_repeat = counts.max(axis=-1) <= 1
        best = np.where(no_repeat, w - 1, best)
    out = np.take_along_axis(win, best[..., np.newaxis], axis=-1)[..., 0]
    if sparse:
        all_zero = (win == 0).all(axis=-1)
        out = np.where(all_zero, 0, out)
    return out.astype(win.dtype)


_BIT_VIEW = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def _bit_view(arr: np.ndarray) -> np.ndarray:
    """Reinterpret any 8/16/32/64-bit dtype as unsigned bits
    (accelerated.pyx:1198-1231: `img.view(np.uintN)`)."""
    try:
        udt = _BIT_VIEW[arr.dtype.itemsize]
    except KeyError:
        raise TypeError(f"no {arr.dtype.itemsize * 8}-bit unsigned view")
    return np.ascontiguousarray(arr).view(udt)


def _mode_pad(batch: np.ndarray, window: int) -> np.ndarray:
    """Partial trailing window for mode: replicate the FIRST element of
    the partial window so it wins outright (reference odd-edge copies
    the lone input pixel, accelerated.hpp:1046-1057)."""
    n = batch.shape[1]
    rem = n % window
    if rem == 0:
        return batch
    first = batch[:, n - rem : n - rem + 1]
    # the whole partial window becomes its first element, so it wins
    # outright under every mode tie-break
    pad_block = np.repeat(first, window, axis=1)
    return np.concatenate([batch[:, : n - rem], pad_block], axis=1)


def mode_pool(
    tokens: np.ndarray,
    window: int = 4,
    num_tiers: int = 1,
    sparse: bool = False,
) -> list[np.ndarray]:
    """Multi-tier majority-vote (mode) pooling, mode-of-modes across
    tiers (downsample.py:200-247).  w=4 uses the COUNTLESS tie-break,
    w=8 counting mode with scan-order tie-break, w=2 degenerates to
    'first element wins pairs' via the same countless chain semantics
    (a==b -> a else ... else b ≡ mode of a pair with a preferred)."""
    batch, squeeze = _as_batch(tokens)
    validate_pool_args(batch.shape[1], window, num_tiers)
    if batch.dtype.kind in "fc":
        # mode-pool ANY 8/16/32/64-bit dtype by viewing its raw bits as
        # unsigned — the reference's dispatch (accelerated.pyx:1198-1231,
        # 1271-1296): NaN windows compare bit-equal, -0.0 != +0.0.
        uview = _bit_view(batch)
        pooled = mode_pool(uview, window, num_tiers, sparse=sparse)
        return [
            p.view(batch.dtype)[0] if squeeze else p.view(batch.dtype)
            for p in pooled
        ]
    if not np.issubdtype(batch.dtype, np.integer):
        raise TypeError(f"mode_pool: unsupported dtype {batch.dtype}")

    results: list[np.ndarray] = []
    cur = batch
    for _ in range(num_tiers):
        win = _windows(_mode_pad(cur, window), window)[:, : out_len(cur.shape[1], window)]
        if window == 2:
            a, b = win[..., 0], win[..., 1]
            if sparse:
                nxt = np.where(a != 0, a, b)
            else:
                nxt = a.copy()  # pair mode: a always ties-or-wins
        elif window == 4:
            nxt = _stippled4_one(win) if sparse else _mode4_one(win)
        else:
            nxt = _mode8_one(win, sparse)
        results.append(nxt)
        cur = nxt

    return [r[0] if squeeze else r for r in results]


def _reduce_pool(tokens, window, num_tiers, fn) -> list[np.ndarray]:
    batch, squeeze = _as_batch(tokens)
    validate_pool_args(batch.shape[1], window, num_tiers, pot_only=False)
    results = []
    cur = batch
    for _ in range(num_tiers):
        win = _windows(cur, window)
        cur = fn(win, axis=2)
        results.append(cur)
    return [r[0] if squeeze else r for r in results]


def max_pool(tokens, window: int = 4, num_tiers: int = 1) -> list[np.ndarray]:
    """Strided maximum reduce per window (downsample.py:147-159)."""
    return _reduce_pool(tokens, window, num_tiers, np.max)


def min_pool(tokens, window: int = 4, num_tiers: int = 1) -> list[np.ndarray]:
    """Strided minimum reduce per window (downsample.py:161-173)."""
    return _reduce_pool(tokens, window, num_tiers, np.min)


def stride_pool(tokens, window: int = 4, num_tiers: int = 1) -> list[np.ndarray]:
    """Keep every window-th element (downsample.py:485-506)."""
    batch, squeeze = _as_batch(tokens)
    validate_pool_args(batch.shape[1], window, num_tiers, pot_only=False)
    results = []
    cur = batch
    for _ in range(num_tiers):
        cur = cur[:, ::window]
        results.append(cur)
    return [r[0] if squeeze else r for r in results]


# -- true 2-D (tile) kernels: the reference's actual 2x2 geometry --------
#
# A tile is a dense 2-D array (rows = docs in a (source, time_bucket)
# group ordered by doc_id, cols = token positions) — the engine analog
# of one image plane.  Window offsets follow the reference's (x, y)
# scan order: a=(0,0), b=(1,0), c=(0,1), d=(1,1) with x = first axis
# (accelerated.hpp:1026-1030).


def _tile_windows(tile: np.ndarray) -> tuple[np.ndarray, ...]:
    if tile.shape[0] % 2 or tile.shape[1] % 2:
        raise ValueError(f"tile dims must be even, got {tile.shape}")
    a = tile[0::2, 0::2]
    b = tile[1::2, 0::2]
    c = tile[0::2, 1::2]
    d = tile[1::2, 1::2]
    return a, b, c, d


def avg_pool_2d(tile: np.ndarray, dtype=np.int32) -> np.ndarray:
    """One 2x2 average-pool tier over a 2-D tile: promoted block sum
    >> 2, signed rounding toward zero (single-mip path, hpp:314-448)."""
    dt = np.dtype(dtype)
    a, b, c, d = _tile_windows(np.asarray(tile))
    if np.issubdtype(dt, np.floating):
        acc = (
            a.astype(dt) + b.astype(dt) + c.astype(dt) + d.astype(dt)
        )
        return (acc / dt.type(4)).astype(dt)
    acc = (
        a.astype(np.int64) + b.astype(np.int64) + c.astype(np.int64)
        + d.astype(np.int64)
    )
    return _render_int(acc, 2, dt)


def avg_pool_2d_multi(
    tile: np.ndarray, num_tiers: int, dtype=np.int32
) -> list[np.ndarray]:
    """Multi-mip 2x2 average over a 2-D tile with the shared widened
    accumulator: render mip m as ``blocksum >> 2((m%4)+1)``, renorm the
    accumulator at the shift-8 boundary — the accelerated pyramid
    semantics (accelerated.pyx:197-263) in the true 2-D geometry."""
    dt = np.dtype(dtype)
    tile = np.asarray(tile)
    if min(tile.shape[:2]) < 2**num_tiers:
        raise ValueError(
            f"tile {tile.shape} too small for {num_tiers} 2x2 tiers"
        )

    def block_sum(arr):
        a, b, c, d = _tile_windows(arr)
        return a + b + c + d

    accum = block_sum(tile.astype(np.int64))
    results: list[np.ndarray] = []
    for m in range(num_tiers):
        shift = 2 * ((m % 4) + 1)
        results.append(_render_int(accum, shift, dt))
        if m == num_tiers - 1:
            break
        if shift == 8:
            accum = accum >> 8  # cycle-boundary renorm (pyx:240-241)
        accum = block_sum(accum)
    return results


def mode_pool_2d_multi(tile: np.ndarray, num_tiers: int) -> list[np.ndarray]:
    """Multi-mip 2x2 mode over a 2-D tile: mode-of-modes recursion
    (downsample.py:215-217)."""
    results: list[np.ndarray] = []
    cur = np.asarray(tile)
    for _ in range(num_tiers):
        cur = mode_pool_2d(cur)
        results.append(cur)
    return results


def mode_pool_2d(tile: np.ndarray) -> np.ndarray:
    """One 2x2 mode-pool tier over a 2-D tile: the countless-if chain
    a==b -> a; a==c -> a; b==c -> b; else d (hpp:1023-1042).  Float
    tiles are pooled on their raw bits (pyx:1198-1231)."""
    tile = np.asarray(tile)
    if tile.dtype.kind in "fc":
        return mode_pool_2d(_bit_view(tile)).view(tile.dtype)
    if not np.issubdtype(tile.dtype, np.integer):
        raise TypeError(f"mode_pool_2d: unsupported dtype {tile.dtype}")
    a, b, c, d = _tile_windows(tile)
    return np.where((a == b) | (a == c), a, np.where(b == c, b, d)).astype(
        tile.dtype
    )


_KERNELS = {
    "avg": avg_pool,
    "mode": mode_pool,
    "max": max_pool,
    "min": min_pool,
    "stride": stride_pool,
}


def pool(
    kind: str,
    tokens: np.ndarray,
    window: int = 4,
    num_tiers: int = 1,
    sparse: bool = False,
    dtype=None,
) -> list[np.ndarray]:
    """Uniform dispatch over the five pooling kernels (the reference's
    public surface, tinybrain/__init__.py:1-10 + downsample.py:161).
    AVG routes non-{2,4,8} windows to the numpy-generic path, like the
    reference's factor dispatch (downsample.py:47-57)."""
    if kind in ("avg",):
        if window not in (2, 4, 8):
            arr = np.asarray(tokens)
            if dtype is not None:
                arr = arr.astype(np.dtype(dtype), copy=False)
            return avg_pool_generic(arr, window, num_tiers, sparse=sparse)
        return avg_pool(tokens, window, num_tiers, sparse=sparse, dtype=dtype)
    if kind == "mode":
        return mode_pool(tokens, window, num_tiers, sparse=sparse)
    if kind in ("max", "min", "stride"):
        return _KERNELS[kind](tokens, window, num_tiers)
    raise ValueError(f"unknown kernel kind: {kind!r}")
