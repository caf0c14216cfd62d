"""Arrow-vectorized pandas UDFs wrapping the numpy pooling kernels.

The Arrow batch boundary (JVM -> Python worker) is this engine's analog
of the reference's Python -> Cython boundary (downsample.py:53): data
crosses once per ~4096-row batch, then everything is vectorized numpy.
No per-row Python anywhere (BASELINE.json input_hint mandate).

Rows inside a batch are grouped by token-array length and pooled as one
dense 2-D matrix per length group — the batched analog of the
reference's dense-plane kernels.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from . import kernels as K

__all__ = [
    "pool_udf",
    "float_pool_udf",
    "pool_all_tiers_udf",
    "pool_tiers_map_in_arrow",
    "pool_tier_map_in_arrow",
    "avg_step_udf",
    "avg_step_map_in_arrow",
    "batch_apply",
]


def _stack_by_length(
    values: pd.Series,
    dtype,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (row_indices, stacked_2d) per distinct array length.

    One np.stack per length group keeps the kernel input dense; the
    typical table has a handful of distinct n_tok values so this is
    O(#groups) python, not O(#rows).
    """
    arrays = values.to_numpy()
    lengths = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=len(arrays))
    for n in np.unique(lengths):
        idx = np.nonzero(lengths == n)[0]
        stacked = np.empty((len(idx), n), dtype=dtype)
        for j, i in enumerate(idx):
            stacked[j] = arrays[i]
        yield idx, stacked


def batch_apply(
    values: pd.Series,
    fn: Callable[[np.ndarray], np.ndarray],
    dtype=np.int32,
) -> pd.Series:
    """Apply a batch kernel (2-D in, 2-D out) over a series of arrays,
    grouping rows by length."""
    out = np.empty(len(values), dtype=object)
    for idx, stacked in _stack_by_length(values, dtype):
        res = fn(stacked)
        for j, i in enumerate(idx):
            out[i] = res[j]
    return pd.Series(out)


def pool_udf(
    kind: str,
    window: int = 4,
    num_tiers: int = 1,
    sparse: bool = False,
    tier: int | None = None,
    guard_tiers: int | None = None,
):
    """Scalar pandas UDF: tokens array -> pooled array at `tier`
    (default: the deepest tier). Stays fully inside one projection —
    no shuffle is ever required for pooling itself.

    ``guard_tiers``: enforce the pyramid-depth minimum-size guard
    (accelerated.pyx:89-90, n >= window**guard_tiers) per batch, so the
    engine needs no driver-side pre-scan to validate a deep pyramid."""
    pick = (num_tiers if tier is None else tier) - 1

    @F.pandas_udf(ArrayType(IntegerType()))
    def _pool(tokens: pd.Series) -> pd.Series:
        def kernel(batch: np.ndarray) -> np.ndarray:
            if guard_tiers is not None:
                K.validate_pool_args(
                    batch.shape[1], window, guard_tiers, pot_only=False
                )
            res = K.pool(kind, batch, window=window, num_tiers=num_tiers,
                         sparse=sparse, dtype=np.int32)
            return res[pick]

        return batch_apply(tokens, kernel)

    return _pool


def float_pool_udf(
    kind: str = "avg",
    window: int = 4,
    num_tiers: int = 1,
    sparse: bool = False,
    tier: int | None = None,
):
    """Scalar pandas UDF over float32 token arrays: the reference's
    float tier semantics — divide the running accumulator by
    ``w^(m+1)`` with NO cycle renormalization (accelerated.pyx:469-599,
    divisor at :497).  Input may be int or float; pooled in float32."""
    pick = (num_tiers if tier is None else tier) - 1

    @F.pandas_udf(ArrayType(FloatType()))
    def _pool(tokens: pd.Series) -> pd.Series:
        def kernel(batch: np.ndarray) -> np.ndarray:
            res = K.pool(kind, batch, window=window, num_tiers=num_tiers,
                         sparse=sparse, dtype=np.float32)
            return res[pick]

        return batch_apply(tokens, kernel, dtype=np.float32)

    return _pool


def pool_all_tiers_udf(
    kind: str,
    window: int = 4,
    num_tiers: int = 1,
    sparse: bool = False,
):
    """Scalar pandas UDF: tokens -> array of per-tier arrays (the
    reference's '[mip0, mip1, ...]' return shape, downsample.py:45)."""

    @F.pandas_udf(ArrayType(ArrayType(IntegerType())))
    def _pool(tokens: pd.Series) -> pd.Series:
        out = np.empty(len(tokens), dtype=object)
        for idx, stacked in _stack_by_length(tokens, np.int32):
            res = K.pool(kind, stacked, window=window, num_tiers=num_tiers,
                         sparse=sparse, dtype=np.int32)
            for j, i in enumerate(idx):
                out[i] = [tier[j] for tier in res]
        return pd.Series(out)

    return _pool


def pool_tiers_map_in_arrow(
    kind: str,
    window: int = 4,
    num_tiers: int = 1,
    sparse: bool = False,
):
    """Arrow-native pooling: returns ``f(df) -> df`` mapping a frame
    with a ``tokens array<int>`` column to ``(tiers
    array<array<int>>)`` via ``mapInArrow`` — the high-throughput path
    for UNIFORM-length batches (pre-tokenized training sequences padded
    to a fixed n_tok, the 100TB ingest shape).

    Why it beats the pandas UDF: profiling shows the bench pyramid is
    Arrow-boundary-bound, not kernel-bound (an IDENTITY pandas UDF
    costs more than the whole pooled pyramid).  Here the ListArray's
    value buffer is viewed as a dense (n, L) int32 matrix zero-copy, the
    kernels run once per batch, and the nested output ListArray is
    built from two vectorized offset buffers — no pandas, no per-row
    object lists on either side.  Ragged batches fall back to the
    per-length-group path with identical results (pinned by test)."""
    import pyarrow as pa

    out_type = pa.list_(pa.list_(pa.int32()))
    out_schema = StructType(
        [StructField("tiers", ArrayType(ArrayType(IntegerType())), True)]
    )

    def _ragged(col: "pa.ListArray") -> "pa.Array":
        out = np.empty(len(col), dtype=object)
        for idx, stacked in _stack_by_length(col.to_pandas(), np.int32):
            res = K.pool(kind, stacked, window=window, num_tiers=num_tiers,
                         sparse=sparse, dtype=np.int32)
            for j, i in enumerate(idx):
                out[i] = [tier[j] for tier in res]
        return pa.array(list(out), type=out_type)

    def _pool_batches(batches):
        for batch in batches:
            col = batch.column(batch.schema.get_field_index("tokens"))
            n = len(col)
            if n == 0:
                continue
            offs = col.offsets.to_numpy()
            lengths = np.diff(offs)
            if col.null_count == 0 and (lengths == lengths[0]).all():
                length = int(lengths[0])
                mat = (
                    col.values.to_numpy()[offs[0]: offs[-1]]
                    .reshape(n, length)
                    .astype(np.int32, copy=False)
                )
                res = K.pool(kind, mat, window=window,
                             num_tiers=num_tiers, sparse=sparse,
                             dtype=np.int32)
                tier_lens = [r.shape[1] for r in res]
                total = sum(tier_lens)
                vals = np.empty((n, total), dtype=np.int32)
                pos = 0
                for r in res:
                    vals[:, pos: pos + r.shape[1]] = r
                    pos += r.shape[1]
                # inner offsets: per row the tier boundaries shifted by
                # row*total; row r's last boundary == row r+1's first,
                # so ravel the open pattern and close with the total
                pattern = np.concatenate(([0], np.cumsum(tier_lens)))
                inner = (
                    np.arange(n, dtype=np.int64)[:, None] * total
                    + pattern[None, :]
                )
                inner_offsets = np.concatenate(
                    [inner[:, :-1].ravel(), [n * total]]
                ).astype(np.int32)
                inner_list = pa.ListArray.from_arrays(
                    pa.array(inner_offsets, type=pa.int32()),
                    pa.array(vals.ravel(), type=pa.int32()),
                )
                outer_offsets = np.arange(
                    0, n * num_tiers + 1, num_tiers, dtype=np.int32
                )
                tiers = pa.ListArray.from_arrays(
                    pa.array(outer_offsets, type=pa.int32()), inner_list
                )
            else:
                tiers = _ragged(col)
            yield pa.RecordBatch.from_arrays(
                [tiers], schema=pa.schema([("tiers", out_type)])
            )

    def apply(df):
        return df.select("tokens").mapInArrow(_pool_batches, out_schema)

    return apply


def _uniform_matrix(col, dtype):
    """(n, L) dense view of a pyarrow ListArray when every row has the
    same length and no nulls; None otherwise (caller falls back)."""
    offs = col.offsets.to_numpy()
    lengths = np.diff(offs)
    if len(lengths) == 0 or col.null_count or not (lengths == lengths[0]).all():
        return None
    n = len(col)
    return (
        col.values.to_numpy()[offs[0]: offs[-1]]
        .reshape(n, int(lengths[0]))
        .astype(dtype, copy=False)
    )


def _list_from_matrix(mat: np.ndarray, pa_type):
    """ListArray from a dense (n, L) matrix — two vectorized buffers."""
    import pyarrow as pa

    n, length = mat.shape
    offsets = pa.array(
        np.arange(0, (n + 1) * length, length, dtype=np.int32),
        type=pa.int32(),
    )
    return pa.ListArray.from_arrays(offsets, pa.array(mat.ravel(), type=pa_type))


def pool_tier_map_in_arrow(
    kind: str,
    window: int = 4,
    sparse: bool = False,
    guard_tiers: int | None = None,
    key_cols: tuple[str, ...] = ("doc_id", "source", "time_bucket"),
):
    """One rollup tier (mode/max/min/stride or single-tier avg) as a
    mapInArrow projection with key-column passthrough: the production
    tier path for uniform-length sequence batches (see
    ``pool_tiers_map_in_arrow`` for why this beats the pandas UDF).
    Returns ``f(df) -> df`` with columns ``key_cols + (tokens, n_tok)``
    — the exact schema rollup's ``_pool_tier`` emits."""
    import pyarrow as pa

    def kernel(mat: np.ndarray) -> np.ndarray:
        if guard_tiers is not None:
            K.validate_pool_args(mat.shape[1], window, guard_tiers,
                                 pot_only=False)
        return K.pool(kind, mat, window=window, num_tiers=1,
                      sparse=sparse, dtype=np.int32)[0]

    def _batches(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            col = batch.column(batch.schema.get_field_index("tokens"))
            mat = _uniform_matrix(col, np.int32)
            if mat is not None:
                pooled = kernel(mat)
                tok = _list_from_matrix(pooled, pa.int32())
                ntok = pa.array(
                    np.full(n, pooled.shape[1], dtype=np.int32),
                    type=pa.int32(),
                )
            else:
                out = np.empty(n, dtype=object)
                for idx, stacked in _stack_by_length(col.to_pandas(), np.int32):
                    r = kernel(stacked)
                    for j, i in enumerate(idx):
                        out[i] = r[j]
                tok = pa.array(list(out), type=pa.list_(pa.int32()))
                ntok = pa.array(
                    [len(x) for x in out], type=pa.int32()
                )
            keys = [
                batch.column(batch.schema.get_field_index(k))
                for k in key_cols
            ]
            yield pa.RecordBatch.from_arrays(
                keys + [tok, ntok], names=[*key_cols, "tokens", "n_tok"]
            )

    def apply(df):
        out = StructType(
            [df.schema[k] for k in key_cols]
            + [
                StructField("tokens", ArrayType(IntegerType()), True),
                StructField("n_tok", IntegerType(), True),
            ]
        )
        return df.select(*key_cols, "tokens").mapInArrow(_batches, out)

    return apply


def avg_step_map_in_arrow(
    window: int = 4,
    sparse: bool = False,
    tier: int = 1,
    guard_tiers: int | None = None,
    key_cols: tuple[str, ...] = ("doc_id", "source", "time_bucket"),
):
    """The AVG persisted-accumulator tier step as a mapInArrow
    projection (key passthrough + tokens/n_tok/accum/denom) — identical
    semantics to ``avg_step_udf`` via the shared ``_avg_step_matrices``
    (pinned by test), minus the pandas object-Series round trip."""
    import pyarrow as pa

    in_cols = ("tokens",) if tier == 1 else ("accum", "denom")

    def _batches(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            col = batch.column(batch.schema.get_field_index(in_cols[0]))
            dcol = (
                batch.column(batch.schema.get_field_index("denom"))
                if tier > 1 and sparse
                else None
            )
            mat = _uniform_matrix(col, np.int64)
            dmat = _uniform_matrix(dcol, np.int64) if dcol is not None else None
            if mat is not None and (dcol is None or dmat is not None):
                acc, den, r = _avg_step_matrices(
                    mat, dmat, window, sparse, tier, guard_tiers
                )
                accum = _list_from_matrix(acc, pa.int64())
                denom = (
                    _list_from_matrix(den, pa.int64())
                    if sparse
                    else pa.nulls(n, type=pa.list_(pa.int64()))
                )
                tok = _list_from_matrix(r, pa.int32())
                ntok = pa.array(
                    np.full(n, r.shape[1], dtype=np.int32), type=pa.int32()
                )
            else:
                values = col.to_pandas()
                denoms = dcol.to_pandas() if dcol is not None else None
                acc_o = np.empty(n, dtype=object)
                den_o = np.empty(n, dtype=object)
                r_o = np.empty(n, dtype=object)
                for idx, stacked in _stack_by_length(values, np.int64):
                    dstack = None
                    if tier > 1 and sparse:
                        dstack = np.empty_like(stacked)
                        for j, i in enumerate(idx):
                            dstack[j] = denoms.iloc[i]
                    acc, den, r = _avg_step_matrices(
                        stacked, dstack, window, sparse, tier, guard_tiers
                    )
                    for j, i in enumerate(idx):
                        acc_o[i] = acc[j]
                        den_o[i] = den[j] if sparse else None
                        r_o[i] = r[j]
                accum = pa.array(list(acc_o), type=pa.list_(pa.int64()))
                denom = pa.array(list(den_o), type=pa.list_(pa.int64()))
                tok = pa.array(list(r_o), type=pa.list_(pa.int32()))
                ntok = pa.array([len(x) for x in r_o], type=pa.int32())
            keys = [
                batch.column(batch.schema.get_field_index(k))
                for k in key_cols
            ]
            yield pa.RecordBatch.from_arrays(
                keys + [tok, ntok, accum, denom],
                names=[*key_cols, "tokens", "n_tok", "accum", "denom"],
            )

    def apply(df):
        out = StructType(
            [df.schema[k] for k in key_cols]
            + [
                StructField("tokens", ArrayType(IntegerType()), True),
                StructField("n_tok", IntegerType(), True),
                StructField("accum", ArrayType(LongType()), True),
                StructField("denom", ArrayType(LongType()), True),
            ]
        )
        cols = [*key_cols, *in_cols]
        if tier > 1 and not sparse:
            cols = [*key_cols, "accum"]
        return df.select(*cols).mapInArrow(_batches, out)

    return apply


# -- incremental tier stepping (the persisted-accumulator fast path) ----

_STEP_SCHEMA = StructType(
    [
        StructField("accum", ArrayType(LongType()), False),
        StructField("denom", ArrayType(LongType()), True),
        StructField("rendered", ArrayType(IntegerType()), False),
    ]
)


def _avg_step_params(window: int, tier: int) -> tuple[int, int, bool]:
    """(shift, prev_shift, renorm) for one tier step (pyx:224,240-241)."""
    log2w = K._LOG2[window]
    cycle = K._cycle(window, np.dtype(np.int32))
    m = tier - 1
    shift = log2w * ((m % cycle) + 1)
    prev_shift = log2w * (((m - 1) % cycle) + 1) if m > 0 else 0
    renorm = m > 0 and prev_shift == log2w * cycle
    return shift, prev_shift, renorm


def _avg_step_matrices(
    stacked: np.ndarray,
    dstack: "np.ndarray | None",
    window: int,
    sparse: bool,
    tier: int,
    guard_tiers: int | None,
):
    """One dense length-group of the AVG tier step: returns
    (acc int64 (n, L/w), den int64|None, rendered int32).  Shared by the
    pandas and mapInArrow flavors so the cycle-renorm / sparse-denom
    semantics live in exactly one place."""
    shift, prev_shift, renorm = _avg_step_params(window, tier)
    if tier == 1:
        if guard_tiers is not None:
            # pyramid-depth guard per batch (pyx:89-90) — no
            # driver-side pre-scan needed
            K.validate_pool_args(
                stacked.shape[1], window, guard_tiers, pot_only=False
            )
        acc = K._windows(stacked, window).sum(axis=2, dtype=np.int64)
        den = (
            K._windows((stacked != 0).astype(np.int64), window).sum(
                axis=2, dtype=np.int64
            )
            if sparse
            else None
        )
    else:
        prev = stacked
        if renorm:
            prev = prev >> prev_shift  # pyx:240-241 boundary renorm
        acc = K._windows(prev, window).sum(axis=2, dtype=np.int64)
        den = None
        if sparse:
            if renorm and window == 8:
                dstack = dstack >> prev_shift  # pyx:758-761 quirk
            den = K._windows(dstack, window).sum(axis=2, dtype=np.int64)

    if sparse:
        r = np.where(den == 0, 0, K._trunc_div(acc, np.maximum(den, 1)))
    else:
        r = K._render_int(acc, shift, np.dtype(np.int64))
    return acc, den, r.astype(np.int32)


def avg_step_udf(
    window: int = 4,
    sparse: bool = False,
    tier: int = 1,
    guard_tiers: int | None = None,
):
    """One retention-tier step for AVG from persisted accumulators.

    Tier k+1 extends the int64 block-sum accumulator persisted with
    tier k instead of re-pooling rendered values — the engine analog of
    the reference's multi-mip shared accumulator (accelerated.pyx:
    223-259, SURVEY.md O2).  ``tier`` is 1-based; tier 1 initializes the
    accumulator from raw tokens.
    """

    @F.pandas_udf(_STEP_SCHEMA)
    def _step(values: pd.Series, denoms: pd.Series) -> pd.DataFrame:
        n = len(values)
        accum_out = np.empty(n, dtype=object)
        denom_out = np.empty(n, dtype=object)
        rendered = np.empty(n, dtype=object)

        for idx, stacked in _stack_by_length(values, np.int64):
            dstack = None
            if tier > 1 and sparse:
                dstack = np.empty_like(stacked)
                for j, i in enumerate(idx):
                    dstack[j] = denoms.iloc[i]
            acc, den, r = _avg_step_matrices(
                stacked, dstack, window, sparse, tier, guard_tiers
            )
            for j, i in enumerate(idx):
                accum_out[i] = acc[j]
                denom_out[i] = den[j] if sparse else None
                rendered[i] = r[j]

        return pd.DataFrame(
            {
                "accum": pd.Series(accum_out),
                "denom": pd.Series(denom_out),
                "rendered": pd.Series(rendered),
            }
        )

    return _step
