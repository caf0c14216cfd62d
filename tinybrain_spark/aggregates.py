"""Continuous aggregates per (source, time_bucket), maintained
incrementally (north_rule: 'continuous aggregates ... maintained
incrementally per (source, time-bucket) partition').

The aggregate state is sum-mergeable (count / token count / sum / min /
max), so incremental maintenance is: aggregate the new batch, then
combine with the stored state by key and overwrite only the touched
source partitions — a MERGE INTO on Iceberg, partition-dynamic
overwrite on the Parquet fallback.

Skew: the partial aggregation is salted explicitly (hash(doc_id) mod S
added to the grouping key) before the final combine, so one hot Zipf
source spreads over S reducers.  With built-in aggregate functions
Spark already does map-side partial aggregation; the explicit salt
additionally protects the final exchange when a single (source, bucket)
key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import Catalog
from .partitioning import with_salt

AGG_KEY = ("source", "time_bucket")

_STATE_COLS = ("n_docs", "n_points", "token_sum", "token_min", "token_max")


def aggregate_batch(df: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregation of a sequence/tier table into
    per-(source, time_bucket) rollup state."""
    per_row = df.select(
        "source",
        "time_bucket",
        "doc_id",
        F.size("tokens").alias("row_points"),
        F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "row_sum"
        ),
        F.array_min("tokens").alias("row_min"),
        F.array_max("tokens").alias("row_max"),
    )
    partial = (
        with_salt(per_row, salt_buckets)
        .groupBy("source", "time_bucket", "salt")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("row_points").alias("n_points"),
            F.sum("row_sum").alias("token_sum"),
            F.min("row_min").alias("token_min"),
            F.max("row_max").alias("token_max"),
        )
    )
    return combine_states(partial.drop("salt"))


def combine_states(states: DataFrame) -> DataFrame:
    """Merge sum-mergeable aggregate states by key."""
    return states.groupBy(*AGG_KEY).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_points").alias("n_points"),
        F.sum("token_sum").alias("token_sum"),
        F.min("token_min").alias("token_min"),
        F.max("token_max").alias("token_max"),
    )


def update_continuous_aggregate(
    catalog: Catalog,
    table: str,
    new_batch: DataFrame,
    salt_buckets: int = 16,
) -> DataFrame:
    """Incrementally fold a new batch of rows into the stored aggregate.

    Only partitions (sources) present in the batch are rewritten; the
    result equals a full recompute over all data ever folded in (the
    invariant test_continuous_agg pins).
    """
    delta = aggregate_batch(new_batch, salt_buckets)
    if catalog.exists(table):
        existing = catalog.read(table)
        touched = delta.select("source").distinct()
        relevant = existing.join(F.broadcast(touched), "source", "left_semi")
        merged = combine_states(relevant.unionByName(delta))
    else:
        merged = delta
    catalog.write(
        merged, table, partition_by=("source",), mode="overwrite_partitions"
    )
    return catalog.read(table)
