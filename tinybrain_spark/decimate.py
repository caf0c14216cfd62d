"""LTTB downsampling — Largest-Triangle-Three-Buckets (Steinarsson,
2013), the shape-preserving line-chart decimation: keep the point in
each bucket forming the largest triangle with the previously kept point
and the next bucket's centroid.  Complements q_m4_decimate (M4 keeps
exact extrema; LTTB keeps visual shape at a fixed point budget).

Distribution shape: LTTB is sequential WITHIN a series (each pick
depends on the previous one) but embarrassingly parallel ACROSS series,
so the Spark op is one applyInPandas per key — the same bounded-group
contract as the tile/gorilla paths (series length is bounded upstream
by the engine's chunking; a 10^9-point single series would be chunked
first, like compress.py's 8192-point Gorilla blobs).

Not SQL-expressible (the sequential dependency), so it is pinned by
tests against a literal reference implementation instead of a DuckDB
oracle — the same evidence class as streaming.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def lttb_indices(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points of a (sorted-by-t) series.

    First and last points are always kept; interior points are chosen
    bucket-by-bucket maximizing twice-the-triangle-area (cross product
    magnitude) against the previous selection and the next bucket's
    mean — float arithmetic, ties broken by the first maximal index
    (np.argmax), deterministic for a given series."""
    n = len(t)
    if n_out >= n or n_out <= 2:
        if n_out >= n:
            return np.arange(n)
        return np.array([0, n - 1]) if n_out == 2 else np.array([0])
    t = t.astype(np.float64)
    v = v.astype(np.float64)
    # bucket boundaries over the interior points [1, n-1)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
        # next bucket's centroid (the last "bucket" is the final point)
        if nhi <= nlo:
            nlo, nhi = n - 1, n
        ct = t[nlo:nhi].mean()
        cv = v[nlo:nhi].mean()
        # |cross| of (prev->candidate) x (prev->centroid)
        area = np.abs(
            (t[lo:hi] - t[prev]) * (cv - v[prev])
            - (ct - t[prev]) * (v[lo:hi] - v[prev])
        )
        prev = lo + int(np.argmax(area))
        out[b + 1] = prev
    out[-1] = n - 1
    return out


def lttb_decimate(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    n_out: int,
) -> DataFrame:
    """Downsample each key's series to ``n_out`` points with LTTB.

    Input rows (key..., t, v) with integer t/v (the engine's
    epoch-second + scaled-value convention); output the kept rows'
    (key..., t, v) — one hash exchange on the keys, the per-group
    sort and selection run inside the Python worker on a bounded
    series."""
    import pandas as pd

    schema = StructType(
        [df.schema[k] for k in key_cols]
        + [StructField(t_col, LongType()), StructField(v_col, LongType())]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col, ignore_index=True)
        idx = lttb_indices(
            pdf[t_col].to_numpy(np.int64),
            pdf[v_col].to_numpy(np.int64),
            n_out,
        )
        return pdf.iloc[idx][list(schema.fieldNames())]

    sel = df.select(*key_cols, t_col, v_col)
    return sel.groupBy(*key_cols).applyInPandas(_one, schema)


def ewma_ref(v: np.ndarray, alpha_ppt: int) -> np.ndarray:
    """LITERAL per-element reference recurrence (the differential-test
    oracle): ``s_0 = v_0``,
    ``s_i = (alpha * v_i + (1000 - alpha) * s_{i-1}) DIV 1000``."""
    a, b = alpha_ppt, 1000 - alpha_ppt
    s = np.empty_like(v)
    if len(v):
        s[0] = v[0]
        for i in range(1, len(v)):
            s[i] = (a * v[i] + b * s[i - 1]) // 1000
    return s


_LONE_CHUNK = 1024  # speculative chunk length for single-series EWMA
_LONE_MIN = 4096  # below this a plain scalar loop wins


def _ewma_lone(
    values: np.ndarray,
    st: int,
    ln: int,
    a: int,
    b: int,
    out: np.ndarray,
    chunk_len: int = _LONE_CHUNK,
) -> None:
    """Exact EWMA of ONE series without walking Python per point
    (VERDICT r04 #6): speculative chunked scan.

    Split the series into ``chunk_len`` chunks and run the provisional
    recurrence VECTORIZED ACROSS CHUNKS (the same time-major trick as
    the multi-series path), seeding each chunk as if it were a fresh
    series.  Then a scalar fixup walks each chunk from its TRUE
    incoming state and stops at the first position where the true
    state equals the provisional one — from there the suffix is
    identical, because the recurrence is deterministic given (state,
    input).  The integer EWMA contracts state differences by b/1000
    per step, so the fixup typically converges in tens of steps; the
    provable worst case (alpha near 0, no contraction) degrades to the
    plain scalar loop, never to a wrong answer.  Bit-identical to
    :func:`ewma_ref` (differential + hypothesis pinned)."""
    if ln == 0:
        return
    if a == 0:
        # s_i = (1000 * s_{i-1}) // 1000 = s_0 forever
        out[st : st + ln] = values[st]
        return
    if ln < _LONE_MIN:
        vl = values[st : st + ln].tolist()
        s = vl[0]
        res = [s]
        for i in range(1, ln):
            s = (a * vl[i] + b * s) // 1000
            res.append(s)
        out[st : st + ln] = res
        return
    n_chunks = ln // chunk_len
    body = n_chunks * chunk_len
    # time-major (chunk_len, n_chunks): chunk c is column c
    V = (
        values[st : st + body]
        .reshape(n_chunks, chunk_len)
        .T.copy()
    )
    S = np.empty_like(V)
    S[0] = V[0]
    prev = S[0]
    t1 = np.empty(n_chunks, dtype=np.int64)
    for k in range(1, chunk_len):
        sk = S[k]
        np.multiply(prev, b, out=t1)
        np.multiply(V[k], a, out=sk)
        sk += t1
        np.floor_divide(sk, 1000, out=sk)
        prev = sk
    # scalar fixup: chunk 0's seed (s = v_0) is the true recurrence
    # start, so its provisional column is already exact.  Convert only
    # a prefix window to python ints — contraction means the match
    # lands within tens of steps, so .tolist() of the full column
    # would cost more than the fixup itself.
    carry = int(S[chunk_len - 1, 0])
    win = 160
    for c in range(1, n_chunks):
        s = carry
        fixed = []
        matched = chunk_len
        j = 0
        while j < chunk_len:
            hi = min(j + win, chunk_len)
            vl = V[j:hi, c].tolist()
            pl = S[j:hi, c].tolist()
            for i in range(hi - j):
                s = (a * vl[i] + b * s) // 1000
                if s == pl[i]:
                    matched = j + i
                    break
                fixed.append(s)
            if matched < chunk_len:
                break
            j = hi
        if fixed:
            # prefix the true values; past `matched` (if any) the
            # provisional suffix is already exact
            S[: len(fixed), c] = fixed
        carry = int(S[chunk_len - 1, c])
    out[st : st + body] = S.T.reshape(-1)
    # ragged tail: scalar from the true final body state
    if body < ln:
        vl = values[st + body : st + ln].tolist()
        s = carry
        res = []
        for x in vl:
            s = (a * x + b * s) // 1000
            res.append(s)
        out[st + body : st + ln] = res


def ewma_many(
    values: np.ndarray,
    lengths: np.ndarray,
    alpha_ppt: int,
    cell_cap: int = 1 << 24,
) -> np.ndarray:
    """Exact integer EWMA over MANY series at once (VERDICT r03 #5).

    The recurrence's integer floor breaks associativity, so a single
    series is irreducibly sequential — but the time-step loop can be
    vectorized ACROSS series: pack the concatenated ragged series into
    a (max_len, n_series) padded matrix (time-major, so each step is a
    contiguous row) and run ONE python iteration per time step doing
    whole-width numpy arithmetic.  10^5 points as 100-1000 series run
    ~5-6x faster than the per-element loop (BENCH/NOTES.md), and the
    gap widens with bucket width; a lone series runs the speculative
    chunked scan (:func:`_ewma_lone` — vectorize across CHUNKS of the
    one series, then scalar-fix each chunk's short convergence prefix;
    5x at 100k points, 23x at 10^7, exact in every alpha regime).

    Padding cost is bounded by chunking: series are processed in
    length-sorted column groups capped at ``2^24`` padded cells
    (128 MiB of int64), so a bucket mixing one long and many short
    series never allocates max_len * n_series.

    ``values`` holds the series back-to-back (each already in time
    order); bit-identical to :func:`ewma_ref` per series (pinned by
    differential + hypothesis tests).  |v| must stay < 2^63/1000."""
    a, b = alpha_ppt, 1000 - alpha_ppt
    out = np.empty_like(values)
    n = len(lengths)
    if n == 0:
        return out
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    order = np.argsort(-lengths, kind="stable")  # longest first
    g0 = 0
    while g0 < n:
        # greedy column group: widen while padded cells stay under cap
        max_len = int(lengths[order[g0]])
        if max_len == 0:
            break  # remaining series are empty
        g1 = g0 + 1
        while g1 < n and max_len * (g1 - g0 + 1) <= cell_cap:
            g1 += 1
        cols = order[g0:g1]
        if len(cols) == 1:
            st, ln = int(starts[cols[0]]), int(lengths[cols[0]])
            _ewma_lone(values, st, ln, a, b, out)
            g0 = g1
            continue
        lens_g = lengths[cols]
        starts_g = starts[cols]
        width = len(cols)
        # scatter the ragged series into a time-major padded matrix
        pos_in_series = np.concatenate(
            [np.arange(l, dtype=np.int64) for l in lens_g]
        )
        col_of = np.repeat(np.arange(width, dtype=np.int64), lens_g)
        src = np.concatenate(
            [np.arange(st, st + l, dtype=np.int64)
             for st, l in zip(starts_g, lens_g)]
        )
        flat = pos_in_series * width + col_of
        V = np.zeros(max_len * width, dtype=np.int64)
        V[flat] = values[src]
        V = V.reshape(max_len, width)
        S = np.empty_like(V)
        S[0] = V[0]
        prev = S[0]
        t1 = np.empty(width, dtype=np.int64)
        for k in range(1, max_len):
            sk = S[k]
            np.multiply(prev, b, out=t1)
            np.multiply(V[k], a, out=sk)
            sk += t1
            np.floor_divide(sk, 1000, out=sk)
            prev = sk
        out[src] = S.reshape(-1)[flat]
        g0 = g1
    return out


def ewma_smooth(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    alpha_ppt: int = 200,
    n_buckets: int | None = None,
) -> DataFrame:
    """Integer EWMA smoothing per series: ``s_0 = v_0``,
    ``s_i = (alpha * v_i + (1000 - alpha) * s_{i-1}) DIV 1000`` with
    ``alpha`` in permille — deterministic integer arithmetic, no float
    drift across engines/partitionings.

    Sequential within a series (like LTTB), parallel across series.
    ``n_buckets=None`` groups one applyInPandas call per key (bounded
    series, original shape); setting ``n_buckets`` hash-buckets the
    keys so each python call receives MANY series and runs the
    cross-series vectorized scan (:func:`ewma_many`) — one python
    iteration per time step instead of per point.  Results are
    bit-identical either way (differential-pinned); choose n_buckets ~
    total_points / 10^7 so a bucket's rows fit executor memory.
    Adds ``smoothed`` next to the original value column."""
    import pandas as pd

    schema = StructType(
        [df.schema[k] for k in key_cols]
        + [
            StructField(t_col, LongType()),
            StructField(v_col, LongType()),
            StructField("smoothed", LongType()),
        ]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col, ignore_index=True)
        v = pdf[v_col].to_numpy(np.int64)
        pdf["smoothed"] = ewma_many(
            v, np.array([len(v)], dtype=np.int64), alpha_ppt
        )
        return pdf[list(schema.fieldNames())]

    def _bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([*key_cols, t_col], ignore_index=True)
        v = pdf[v_col].to_numpy(np.int64)
        # series boundaries = key-tuple change points in the sort order
        if len(pdf):
            keys = pdf[key_cols]
            change = (keys != keys.shift()).any(axis=1).to_numpy()
            bounds = np.flatnonzero(change)
            lengths = np.diff(np.append(bounds, len(pdf)))
        else:
            lengths = np.array([], dtype=np.int64)
        pdf["smoothed"] = ewma_many(v, lengths.astype(np.int64), alpha_ppt)
        return pdf[list(schema.fieldNames())]

    sel = df.select(*key_cols, t_col, v_col)
    if n_buckets is None:
        return sel.groupBy(*key_cols).applyInPandas(_one, schema)
    bucket = F.abs(F.xxhash64(*key_cols)) % n_buckets
    return (
        sel.withColumn("_b", bucket)
        .groupBy("_b")
        .applyInPandas(
            lambda pdf: _bucket(pdf.drop(columns=["_b"])), schema
        )
    )
