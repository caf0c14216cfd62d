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


def ewma_smooth(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    alpha_ppt: int = 200,
) -> DataFrame:
    """Integer EWMA smoothing per series: ``s_0 = v_0``,
    ``s_i = (alpha * v_i + (1000 - alpha) * s_{i-1}) DIV 1000`` with
    ``alpha`` in permille — deterministic integer arithmetic, no float
    drift across engines/partitionings.

    Sequential within a series (like LTTB), parallel across series:
    one applyInPandas per key over a bounded series.  Adds ``smoothed``
    next to the original value column."""
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
        s = np.empty_like(v)
        if len(v):
            s[0] = v[0]
            for i in range(1, len(v)):
                s[i] = (alpha_ppt * v[i] + (1000 - alpha_ppt) * s[i - 1]) // 1000
        pdf["smoothed"] = s
        return pdf[list(schema.fieldNames())]

    sel = df.select(*key_cols, t_col, v_col)
    return sel.groupBy(*key_cols).applyInPandas(_one, schema)
