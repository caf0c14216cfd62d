"""Scalable global rank — dense total-order position without a
one-task window.

``Window.orderBy(...)`` with no partition key funnels every row into a
single task (the q_topk_users lesson).  For full rankings (vocabulary
ids, leaderboards) where top-k doesn't apply, the scalable shape is:

1. ``repartitionByRange`` on the order columns — equal keys co-locate,
   partitions hold contiguous key ranges in order;
2. count rows per partition (tiny: one row per partition) and compute
   each partition's starting offset with a window over THAT table;
3. broadcast the offsets back; rank = offset + row_number within the
   partition (bounded sort).

Ranks are independent of where the sampled range boundaries land, so
the result is deterministic even though the partitioning itself isn't.
The same two-level idea as packing.pack_offsets, specialized to
ordering.  NOTE: repartitionByRange SAMPLES its child to pick
boundaries — persist upstream results if recomputing them is expensive
(CLAUDE.md pooling gotcha).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``rank_col`` = 1-based position of each row in the total
    order ``order_by`` (which must be a total order — ties would make
    ranks nondeterministic; include a unique column last)."""
    parted = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    with_pid = parted.withColumn("_pid", F.spark_partition_id())
    counts = with_pid.groupBy("_pid").agg(F.count("*").alias("_n"))
    wp = Window.orderBy("_pid")  # n_partitions rows: tiny by design
    offsets = counts.select(
        "_pid", (F.sum("_n").over(wp) - F.col("_n")).alias("_off")
    )
    win = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(
            rank_col,
            (F.row_number().over(win) + F.col("_off")).cast("long"),
        )
        .drop("_pid", "_off")
    )
