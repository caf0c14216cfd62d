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
        StructField("n_points", IntegerType(), False),
        StructField("raw_bytes", LongType(), False),
        StructField("blob", BinaryType(), False),
    ]
)


def encode_series_table(
    agg: DataFrame,
    value_col: str = "token_sum",
) -> DataFrame:
    """(source, time_bucket, <value_col>) -> one Gorilla blob per source."""

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("time_bucket")
        buckets = pdf["time_bucket"].to_numpy(dtype=np.int64)
        vals = pdf[value_col].to_numpy(dtype=np.int64)
        blob = G.encode_series(buckets, vals)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_points": [len(vals)],
                "raw_bytes": [16 * len(vals)],
                "blob": [blob],
            }
        )

    return (
        agg.select("source", "time_bucket", value_col)
        .groupBy("source")
        .applyInPandas(_encode, BLOB_SCHEMA)
    )


def decode_blob(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    return G.decode_series(bytes(blob))
