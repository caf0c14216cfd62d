"""Similarity search over embedding columns (pipeline op: ANN).

Three layers, ordered by scale:

* ``brute_force_topk_blocked`` — the exact baseline, restructured for
  scale: the probe matrix is broadcast to every partition and each
  Arrow batch computes a dense numpy GEMM (batch x probes), emitting
  per-batch partial top-k; a final groupBy keeps the global top-k.
  O(N·P) work, one narrow shuffle of ~k·P rows — this is the shape
  that survives 10^9 candidate vectors.
* ``lsh_bucket_expr`` — random-hyperplane LSH (sign sketch) with
  DETERMINISTIC pseudo-random planes derived from (plane, dim) by LCG
  arithmetic, so Spark and a SQL oracle compute identical buckets.
  Bucketed candidates turn the N x P cross join into a bucket-local
  join (the IVF/LSH 'scale path').
* 1-NN within bucket for embedding-cosine near-dup detection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

N_PLANES = 8
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483647


def plane_weight(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-0.5, 0.5)."""
    return ((_LCG_A * (plane * 4096 + dim) + _LCG_C) % _LCG_M) / _LCG_M - 0.5


def plane_matrix(n_dims: int, n_planes: int = N_PLANES) -> np.ndarray:
    return np.array(
        [[plane_weight(p, i) for i in range(n_dims)] for p in range(n_planes)],
        dtype=np.float64,
    )


def lsh_bucket_expr(vec_col: str, n_dims: int, n_planes: int = N_PLANES):
    """JVM-side (Catalyst) bucket id: sum of sign bits over planes.
    Pure arithmetic -> SQL-oracle-parity."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.lit(0.0)
        for i in range(n_dims):
            dot = dot + F.element_at(vec_col, i + 1).cast("double") * F.lit(
                plane_weight(p, i)
            )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucket_sql(vec_expr: str, n_dims: int, n_planes: int = N_PLANES) -> str:
    """The identical bucket computation as DuckDB SQL."""
    parts = []
    for p in range(n_planes):
        terms = " + ".join(
            f"{vec_expr}[{i + 1}] * ({plane_weight(p, i)!r})"
            for i in range(n_dims)
        )
        parts.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


TOPK_SCHEMA = StructType(
    [
        StructField("probe_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("cos", DoubleType(), False),
    ]
)


def brute_force_topk_blocked(
    emb: DataFrame,
    probes: list[tuple[int, np.ndarray]],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against a small probe set, GEMM per Arrow
    batch + partial top-k (scale path for the exact baseline).

    emb: (vec_id long, embedding array<float>).  probes: [(id, vec)].
    """
    probe_ids = np.array([p[0] for p in probes], dtype=np.int64)
    pmat = np.stack([np.asarray(p[1], dtype=np.float64) for p in probes])
    pnorm = np.linalg.norm(pmat, axis=1)

    def _score(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            norms = np.linalg.norm(mat, axis=1)
            scores = (mat @ pmat.T) / np.outer(norms, pnorm)  # (batch, P)
            self_mask = ids[:, None] == probe_ids[None, :]
            scores = np.where(self_mask, -np.inf, scores)
            kk = min(k, len(ids))
            # per-batch partial top-k per probe
            top = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (kk, P)
            rows = {
                "probe_id": np.repeat(probe_ids[None, :], kk, axis=0).ravel(),
                "neighbor_id": ids[top].ravel(),
                "cos": np.take_along_axis(scores, top, axis=0).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[np.isfinite(out["cos"])]

    partial = emb.select("vec_id", "embedding").mapInPandas(_score, TOPK_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "probe_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
        )
    )


def bucketed_nn(emb_buckets: DataFrame) -> DataFrame:
    """1-nearest-neighbor within each LSH bucket (embedding-cosine
    near-dup detection, bucket-local join).

    emb_buckets: (vec_id long, embedding array<float>, bucket long).
    Returns (vec_id, nn_id, cos_c) where cos_c = floor(cos * 1000).
    Vectors alone in their bucket are omitted.
    """
    a = emb_buckets.alias("a")
    b = emb_buckets.alias("b")
    pairs = a.join(b, on="bucket").where(F.col("a.vec_id") != F.col("b.vec_id"))
    scored = pairs.select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("cand_id"),
        (
            F.aggregate(
                F.zip_with(
                    F.col("a.embedding"),
                    F.col("b.embedding"),
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (
                F.sqrt(
                    F.aggregate(
                        F.col("a.embedding"),
                        F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double"),
                    )
                )
                * F.sqrt(
                    F.aggregate(
                        F.col("b.embedding"),
                        F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double"),
                    )
                )
            )
        ).alias("cos"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("cand_id").alias("nn_id"),
            F.floor(F.col("cos") * 1000).cast("long").alias("cos_c"),
        )
    )
