"""Spark-side Gorilla encoding of rolled-up point series into
BinaryType columns (north_rule), via grouped applyInPandas.

A series = one source's (time_bucket, value) run, bucket-ordered (the
range partitioning in partitioning.py keeps buckets contiguous, which
is what makes delta-of-delta effective)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import gorilla as G

BLOB_SCHEMA = StructType(
    [
        StructField("source", StringType(), False),
        StructField("chunk", LongType(), False),
        StructField("n_points", IntegerType(), False),
        StructField("raw_bytes", LongType(), False),
        StructField("blob", BinaryType(), False),
    ]
)

# One blob covers at most CHUNK_POINTS consecutive points — the
# Gorilla paper's fixed-block design (§4.1 uses 2-hour blocks).
# Bounds any series' pandas group to a constant task size: a source
# with 10^9 buckets becomes 10^9/CHUNK blobs across many tasks, never
# one single-task group.  Chunking is by per-series point INDEX (a
# row_number window on the same key the groupBy uses — one exchange
# total), so it is unit-agnostic over however callers number buckets.
CHUNK_POINTS = 8192


def encode_series_table(
    agg: DataFrame,
    value_col: str = "token_sum",
    chunk_points: int = CHUNK_POINTS,
) -> DataFrame:
    """(source, time_bucket, <value_col>) -> one Gorilla blob per
    (source, chunk) where each chunk holds <= chunk_points buckets in
    time order."""

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("time_bucket")
        buckets = pdf["time_bucket"].to_numpy(dtype=np.int64)
        vals = pdf[value_col].to_numpy(dtype=np.int64)
        blob = G.encode_series(buckets, vals)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "chunk": [int(pdf["chunk"].iloc[0])],
                "n_points": [len(vals)],
                "raw_bytes": [16 * len(vals)],
                "blob": [blob],
            }
        )

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("source").orderBy("time_bucket")
    chunked = agg.select("source", "time_bucket", value_col).withColumn(
        "chunk",
        ((F.row_number().over(w) - 1) / chunk_points).cast("long"),
    )
    return chunked.groupBy("source", "chunk").applyInPandas(
        _encode, BLOB_SCHEMA
    )


def decode_blob(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    return G.decode_series(bytes(blob))


def decode_series_table(
    blobs: DataFrame,
    value_col: str = "token_sum",
) -> DataFrame:
    """The read side: (source, blob) -> (source, time_bucket, value)
    point rows, batch-decoded with the vectorized decoder (1.5M pts/s
    single-thread) — serving tier data back out of compact blobs."""
    from typing import Iterator

    from pyspark.sql.types import StringType

    schema = StructType(
        [
            StructField("source", StringType(), False),
            StructField("time_bucket", LongType(), False),
            StructField(value_col, LongType(), False),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, buckets, vals = [], [], []
            for source, blob in zip(pdf["source"], pdf["blob"]):
                b, v = G.decode_series(bytes(blob))
                srcs.extend([source] * len(b))
                buckets.append(b)
                vals.append(v)
            if not srcs:
                yield pd.DataFrame(
                    {"source": [], "time_bucket": [], value_col: []}
                )
                continue
            yield pd.DataFrame(
                {
                    "source": srcs,
                    "time_bucket": np.concatenate(buckets),
                    value_col: np.concatenate(vals),
                }
            )

    return blobs.select("source", "blob").mapInPandas(_decode, schema)
