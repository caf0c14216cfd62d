"""Deterministic synthetic tokenized-sequence table generator.

Produces the engine's canonical input shape (BASELINE.json input_hint):
``(doc_id string, tokens array<int32>, n_tok int, source string)`` plus
a derived ``time_bucket``.  Fully distributed: ``spark.range`` drives a
pandas UDF that derives every value from the row id via a counter-based
RNG (``np.random.Philox``), so the table is identical regardless of
partitioning, executor count, or generation order — the property that
lets the same generator produce pytest-scale and 10^9-row bench tables.

Fixture parameters mirror FIXTURES.md §F1: token values uniform in
[0, 256) ("image-like", automated_test.py:131), a Zipf-skewed source
distribution over 16 sources (drives the salting path), and optional
~60% zeros for sparse fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)

N_SOURCES = 16
ZIPF_S = 1.2


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    weights = 1.0 / np.arange(1, n + 1) ** s
    cdf = np.cumsum(weights)
    return cdf / cdf[-1]


def generate(
    spark: SparkSession,
    n_docs: int,
    n_tok: int = 256,
    seed: int = 42,
    sparse_fraction: float = 0.0,
    categorical: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the sequence table. ``categorical=True`` clusters values in
    [1000, 1256) with run-lengths (segmentation-like, perf.py:131);
    otherwise values are uniform in [0, 256)."""
    cdf = _zipf_cdf(N_SOURCES, ZIPF_S)

    @F.pandas_udf(SCHEMA)
    def _gen(ids: pd.Series) -> pd.DataFrame:
        idx = ids.to_numpy(dtype=np.int64)
        rows = len(idx)
        out_tokens = np.empty(rows, dtype=object)
        doc_ids = np.empty(rows, dtype=object)
        sources = np.empty(rows, dtype=object)

        for j, i in enumerate(idx):
            # key=(seed, i): an independent Philox stream per doc.
            # (counter=i would make adjacent docs share most of their
            # stream — correlated rows that parquet compresses 10-30x,
            # silently distorting any I/O benchmark.)
            rng = np.random.Generator(np.random.Philox(key=[seed, i]))
            if categorical:
                # long runs of equal adjacent labels: exercises the
                # instant-majority fast path (README.md:110)
                n_runs = max(1, n_tok // 8)
                run_vals = rng.integers(1000, 1256, size=n_runs)
                run_lens = rng.integers(1, 16, size=n_runs)
                toks = np.repeat(run_vals, run_lens)[:n_tok]
                if len(toks) < n_tok:
                    toks = np.pad(toks, (0, n_tok - len(toks)), mode="edge")
            else:
                toks = rng.integers(0, 256, size=n_tok)
            if sparse_fraction > 0:
                mask = rng.random(n_tok) < sparse_fraction
                toks = np.where(mask, 0, toks)
            out_tokens[j] = toks.astype(np.int32)
            doc_ids[j] = f"doc_{i:010d}"
            u = rng.random()
            sources[j] = f"src_{int(np.searchsorted(cdf, u)):02d}"

        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "tokens": pd.Series(out_tokens),
                "n_tok": np.full(rows, n_tok, dtype=np.int32),
                "source": sources,
            }
        )

    parts = num_partitions or max(32, n_docs // 50_000)
    base = spark.range(0, n_docs, numPartitions=parts)
    df = base.select(_gen(F.col("id")).alias("row")).select("row.*")
    return with_time_bucket(df)


def with_time_bucket(df: DataFrame, buckets_per_source: int = 64) -> DataFrame:
    """Derive a monotone time bucket from the doc id (FIXTURES.md F1):
    deterministic, computable JVM-side (no UDF)."""
    return df.withColumn(
        "time_bucket",
        (
            F.conv(F.substring(F.sha1(F.col("doc_id")), 1, 6), 16, 10).cast("long")
            % buckets_per_source
        ),
    )


EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)


def generate_embeddings(
    spark: SparkSession,
    n_vecs: int,
    n_dims: int = 64,
    n_clusters: int = 1024,
    noise: float = 0.02,
    seed: int = 7,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic clustered embeddings for ANN benchmarks: vector i
    belongs to cluster i % n_clusters, centers are unit-ish Philox
    draws, plus per-vector noise — near-neighbors exist by
    construction (same-cluster vectors), so LSH recall is measurable.
    Counter-based RNG keyed by (seed, cluster) / (seed, i): identical
    output at any partitioning or scale."""

    @F.pandas_udf(EMB_SCHEMA)
    def _gen(ids: pd.Series) -> pd.DataFrame:
        idx = ids.to_numpy(dtype=np.int64)
        out = np.empty(len(idx), dtype=object)
        centers: dict[int, np.ndarray] = {}
        for j, i in enumerate(idx):
            c = int(i % n_clusters)
            center = centers.get(c)
            if center is None:
                crng = np.random.Generator(np.random.Philox(key=[seed, c]))
                center = crng.standard_normal(n_dims)
                center /= np.linalg.norm(center)
                centers[c] = center
            vrng = np.random.Generator(np.random.Philox(key=[seed + 1, i]))
            v = center + noise * vrng.standard_normal(n_dims)
            out[j] = v.astype(np.float32)
        return pd.DataFrame({"vec_id": idx, "embedding": out})

    rng_df = spark.range(n_vecs, numPartitions=num_partitions)
    return rng_df.select(_gen(F.col("id")).alias("r")).select("r.vec_id", "r.embedding")
