"""As-of join — the timeseries operator that matches each left row to
the latest right row at-or-before its timestamp per key (the canonical
point-in-time enrichment: event -> most recent rollup/state row).

Spark lacks a native ASOF JOIN; a sort-merge formulation works at any
scale WITHOUT a range/cross join: tag both sides, union them, and take
``last(value, ignorenulls=True)`` over a per-key window ordered by
(time, side) with right rows sorting before left rows at equal
timestamps (at-or-before includes equality).  One shuffle on the key,
one sort — the same cost as a regular sort-merge join, no candidate
blow-up for wide time gaps.  DuckDB verifies with its native
``ASOF JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Return ``left`` with, for each row, the most recent
    ``value_cols`` from ``right`` where ``right_time <= left_time``
    (per ``keys``); NULLs where no right row precedes the left row."""
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(left_time).cast("long").alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_time).cast("long").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    for c in lcols:
        if c not in keys:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(F.col(f"_v_{c}"), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled.where(F.col("_side") == 1).drop("_side")
