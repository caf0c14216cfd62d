"""Gap-fill for missing time buckets (north_rule: 'gap-fill').

Builds a dense calendar spine per group with ``sequence()`` +
``explode`` (pure Catalyst — no UDF) and LEFT JOINs observed buckets
onto it.  Fill policies:

* ``zero``     — missing measures become 0
* ``null``     — keep NULLs
* ``previous`` — last-observation-carried-forward via
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window

The spine join broadcasts nothing and shuffles once on the group key;
at 10^12-row scale the spine side is tiny (groups × buckets) so AQE
plans it as a broadcast join automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FILL_POLICIES = ("zero", "null", "previous")


def gap_fill(
    df: DataFrame,
    group_cols: list[str],
    bucket_col: str,
    value_cols: list[str],
    policy: str = "zero",
    bucket_min=None,
    bucket_max=None,
) -> DataFrame:
    """Return df densified so every group has one row per bucket in
    [min, max] (global bounds by default, matching a SQL
    generate_series oracle)."""
    if policy not in FILL_POLICIES:
        raise ValueError(f"unknown fill policy {policy!r}")

    bounds = df.agg(
        F.min(bucket_col).alias("lo"), F.max(bucket_col).alias("hi")
    ).first()
    lo = bucket_min if bucket_min is not None else bounds["lo"]
    hi = bucket_max if bucket_max is not None else bounds["hi"]
    if lo is None:
        return df

    groups = df.select(*group_cols).distinct()
    spine = groups.withColumn(
        bucket_col,
        F.explode(F.sequence(F.lit(lo).cast("long"), F.lit(hi).cast("long"))),
    )

    joined = spine.join(df, on=[*group_cols, bucket_col], how="left")

    if policy == "zero":
        filled = joined.select(
            *group_cols,
            bucket_col,
            *[
                F.coalesce(F.col(c), F.lit(0)).alias(c)
                for c in value_cols
            ],
        )
    elif policy == "previous":
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = joined.select(
            *group_cols,
            bucket_col,
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                for c in value_cols
            ],
        )
    else:
        filled = joined.select(*group_cols, bucket_col, *value_cols)

    return filled
