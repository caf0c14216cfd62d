"""Catalyst-native pooling tiers: the zero-Python-boundary path.

``pool_tiers_map_in_arrow`` (udfs.py) is Arrow-boundary-bound — the
kernels are cheaper than shipping the token arrays across the Python
fence (an IDENTITY pandas UDF costs more than the whole pooled
pyramid, BENCH/NOTES.md).  For the windows the bench and the
production rollup actually use (w=4, plus the w=2 engine extension for
avg), every kernel is expressible as pure Catalyst array expressions:

* avg — running int64 block-sum accumulator per tier, bitshift render
  with signed-toward-zero rounding, raw-floor renorm shift at the
  cycle boundary, cyclic odd-edge padding (kernels.avg_pool semantics,
  reference accelerated.pyx:82-599 / accelerated.hpp:66-69,932-946);
  sparse divides by the nonzero count (C-truncating ``DIV``), 0 where
  the window is all zeros.
* mode w=4 — the COUNTLESS tie-break chain ``(a==b)|(a==c) -> a,
  b==c -> b, else d`` (reference downsample.py:250-305), mode-of-modes
  across tiers, first-element odd-edge padding; sparse is the stippled
  variant (downsample.py:355-381).

So the whole pyramid runs inside whole-stage codegen: no Arrow
transfer, no Python workers, and Catalyst prunes/pipelines it like any
other projection.  Bit-equality with the numpy kernels is pinned by
differential tests over random lengths/values/signs (tests/
test_sqlkernels.py).

Caveats: ANSI-mode arithmetic means render casts back to int32 THROW
on overflow where numpy would wrap — inputs must fit the declared
dtype's render range (true for token data; the UDF path keeps numpy
wrap semantics for anything else).  Unsupported (kind, window) combos
raise ValueError — callers fall back to the Arrow path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOG2 = {2: 1, 4: 2, 8: 3}


def _cycle(window: int) -> int:
    # int32 tokens: w=8 -> 8, w=4 -> 4, w=2 -> 8 (kernels._cycle)
    return 4 if window == 4 else 8


def _pad_cyclic(c: Column, w: int) -> Column:
    """Trailing-partial-window cyclic repetition (avg odd-edge rule):
    [..., x, y] w=4 -> [..., x, y, x, y]."""
    size = F.size(c)
    rem = size % w
    pad = F.lit(w) - rem
    tail = F.slice(c, size - rem + 1, rem)
    reps = (pad + rem - F.lit(1)) / rem  # ceil, as double
    pad_block = F.slice(
        F.flatten(F.array_repeat(tail, reps.cast("int"))), 1, pad
    )
    return F.when(rem == 0, c).otherwise(F.concat(c, pad_block))


def _pad_mode(c: Column, w: int) -> Column:
    """Mode odd-edge rule: the whole partial window becomes its FIRST
    element, so it wins outright under every tie-break."""
    size = F.size(c)
    rem = size % w
    first = F.element_at(c, size - rem + 1)
    padded = F.concat(
        F.slice(c, 1, size - rem), F.array_repeat(first, w)
    )
    return F.when(rem == 0, c).otherwise(padded)


def _window_sums(c: Column, w: int) -> Column:
    """(n,) -> (ceil(n/w),) block sums over the cyclic-padded array."""
    p = _pad_cyclic(c, w)
    n_out = (F.size(p) / w).cast("int")
    return F.transform(
        F.sequence(F.lit(1), n_out),
        lambda i: sum(
            (F.element_at(p, (i - 1) * w + j + 1) for j in range(1, w)),
            F.element_at(p, (i - 1) * w + 1),
        ),
    )


def _shift_toward_zero(x: Column, shift: int) -> Column:
    """render_image: >> floors, so negatives round toward zero via
    -((-x) >> shift)."""
    return F.when(
        x < 0, -F.shiftright(-x, shift)
    ).otherwise(F.shiftright(x, shift))


def _floordiv_nonneg(x: Column, d: Column) -> Column:
    """Exact integer floor division of a NONNEGATIVE long by a positive
    long without float hazards (the kmv._exact_div trick: subtracting
    pmod makes the numerator an exact multiple, so the IEEE division is
    the exact integer — valid while quotients stay < 2^53; pooling
    accumulators are bounded by w^tiers * max|token| << 2^53)."""
    return ((x - F.pmod(x, d)) / d).cast("long")


def _trunc_div(a: Column, d: Column) -> Column:
    """C-style truncating division (toward zero) with positive d —
    kernels._trunc_div."""
    return F.when(a < 0, -_floordiv_nonneg(-a, d)).otherwise(
        _floordiv_nonneg(a, d)
    )


def _mode4_chain(a: Column, b: Column, c: Column, d: Column) -> Column:
    return F.when((a == b) | (a == c), a).when(b == c, b).otherwise(d)


def _stippled4_chain(
    a: Column, b: Column, c: Column, d: Column
) -> Column:
    z = F.lit(0).cast("long")
    pair = F.when(
        ((a == b) & (a != 0)) | ((a == c) & (a != 0)), a
    ).otherwise(z)
    pair = F.when((pair == 0) & (b == c) & (b != 0), b).otherwise(pair)
    nonzero = F.when(a != 0, a).otherwise(F.when(b != 0, b).otherwise(c))
    fallback = F.when(d != 0, d).otherwise(nonzero)
    return F.when(pair != 0, pair).otherwise(fallback)


def _mode8_window(p: Column, i, sparse: bool) -> Column:
    """Counting mode of the 8-element window ending the reference's
    way: first scan-order occurrence wins ties (encode as array_max of
    struct(count, 8-position, value) — among equal counts the larger
    8-t, i.e. the EARLIER position, wins; value rides along).  Sparse:
    zeros count -1 (never win unless the window is all zeros -> 0)."""
    win = F.slice(p, (i - 1) * 8 + 1, 8)
    cand = F.transform(
        F.sequence(F.lit(1), F.lit(8)),
        lambda t: F.struct(
            (
                F.when(F.element_at(win, t) == 0, F.lit(-1))
                if sparse
                else F.when(F.lit(False), F.lit(-1))
            )
            .otherwise(
                F.size(
                    F.filter(win, lambda y: y == F.element_at(win, t))
                )
            )
            .alias("cnt"),
            (F.lit(8) - t).alias("ord"),
            F.element_at(win, t).alias("val"),
        ),
    )
    best = F.array_max(cand)["val"]
    if sparse:
        all_zero = F.size(F.filter(win, lambda y: y != 0)) == 0
        return F.when(all_zero, F.lit(0).cast("long")).otherwise(best)
    return best


def _mode_tier(c: Column, sparse: bool, window: int = 4) -> Column:
    """One mode tier over a bound array column (w in {2, 4, 8})."""
    p = _pad_mode(c, window)
    n_out = (F.size(p) / window).cast("int")
    if window == 2:
        if sparse:
            win_fn = lambda i: F.when(  # noqa: E731
                F.element_at(p, (i - 1) * 2 + 1) != 0,
                F.element_at(p, (i - 1) * 2 + 1),
            ).otherwise(F.element_at(p, (i - 1) * 2 + 2))
        else:
            # pair mode: a always ties-or-wins
            win_fn = lambda i: F.element_at(p, (i - 1) * 2 + 1)  # noqa: E731
    elif window == 4:
        chain = _stippled4_chain if sparse else _mode4_chain
        win_fn = lambda i: chain(  # noqa: E731
            F.element_at(p, (i - 1) * 4 + 1),
            F.element_at(p, (i - 1) * 4 + 2),
            F.element_at(p, (i - 1) * 4 + 3),
            F.element_at(p, (i - 1) * 4 + 4),
        )
    else:
        win_fn = lambda i: _mode8_window(p, i, sparse)  # noqa: E731
    return F.transform(F.sequence(F.lit(1), n_out), win_fn)


def pool_tiers_sql(
    kind: str,
    window: int = 4,
    num_tiers: int = 1,
    sparse: bool = False,
):
    """Catalyst twin of ``udfs.pool_tiers_map_in_arrow``: returns
    ``f(df) -> df`` mapping ``tokens array<int>`` to ``tiers
    array<array<int>>`` with bit-identical kernel semantics, entirely
    inside whole-stage codegen.

    Supported: ``avg`` and ``mode`` with window 2, 4, or 8 (dense +
    sparse), i.e. the whole accelerated int32 family: COUNTLESS /
    stippled chains at w=4, counting mode with first-scan-occurrence
    tie-break at w=8, cycle-8 renorm (incl. the w=8 sparse denominator
    shift quirk) for avg.  Anything else raises ValueError so callers
    fall back to the Arrow path."""
    if kind in ("avg", "mode") and window in (2, 4, 8):
        pass
    else:
        raise ValueError(
            f"pool_tiers_sql: unsupported kind={kind!r} window={window}"
        )
    if num_tiers < 1:
        raise ValueError("num_tiers must be >= 1")

    def apply(df: DataFrame) -> DataFrame:
        # kernel-parity validation (kernels.validate_pool_args raises on
        # can't-downsample-below-one-window) — ALSO protects the
        # F.sequence(1, n) calls from the n<=0 auto-step-(-1) trap
        floor = window**num_tiers
        guarded = F.when(
            F.size("tokens") >= floor, F.col("tokens")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "pool_tiers_sql: can't downsample below one "
                        f"window: n_tok="
                    ),
                    F.size("tokens").cast("string"),
                    F.lit(f" < {window}**{num_tiers}"),
                )
            ).cast("array<int>")
        )
        arr = F.transform(guarded, lambda x: x.cast("long"))
        if kind == "mode":
            out = df.withColumn("_t0", arr)
            tiers = []
            for m in range(num_tiers):
                out = out.withColumn(
                    f"_t{m + 1}",
                    _mode_tier(F.col(f"_t{m}"), sparse, window),
                )
                tiers.append(f"_t{m + 1}")
            return out.select(
                F.array(
                    *[
                        F.transform(F.col(t), lambda x: x.cast("int"))
                        for t in tiers
                    ]
                ).alias("tiers")
            )

        log2w = _LOG2[window]
        cycle = _cycle(window)
        out = df.withColumn("_acc0", _window_sums(arr, window))
        if sparse:
            nz = F.transform(
                arr,
                lambda x: F.when(x != 0, F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
            )
            out = out.withColumn("_den0", _window_sums(nz, window))
        renders = []
        for m in range(num_tiers):
            shift = log2w * ((m % cycle) + 1)
            acc, den = F.col(f"_acc{m}"), F.col(f"_den{m}")
            if sparse:
                renders.append(
                    F.zip_with(
                        acc,
                        den,
                        lambda a, d: F.when(
                            d == 0, F.lit(0).cast("long")
                        ).otherwise(_trunc_div(a, d)),
                    )
                )
            else:
                renders.append(
                    F.transform(
                        acc, lambda x: _shift_toward_zero(x, shift)
                    )
                )
            if m == num_tiers - 1:
                break
            nxt, nxt_den = acc, den
            if shift == log2w * cycle:
                # raw floor renorm shift (pyx:240-241); the w=8 path
                # shifts the denominator too (pyx:758-761), the w=4
                # path does NOT — quirk replicated from kernels.py
                nxt = F.transform(acc, lambda x: F.shiftright(x, shift))
                if sparse and window == 8:
                    nxt_den = F.transform(
                        den, lambda x: F.shiftright(x, shift)
                    )
            out = out.withColumn(
                f"_acc{m + 1}", _window_sums(nxt, window)
            )
            if sparse:
                out = out.withColumn(
                    f"_den{m + 1}", _window_sums(nxt_den, window)
                )
        return out.select(
            F.array(
                *[
                    F.transform(r, lambda x: x.cast("int"))
                    for r in renders
                ]
            ).alias("tiers")
        )

    return apply
