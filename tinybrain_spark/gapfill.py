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

Scale guards: spine bounds are a broadcast 1-row aggregate joined into
the same job (no driver-side bounds pre-scan), and the spine explodes
in two levels (chunk starts, then <=SPINE_CHUNK offsets) so no single
``sequence()`` array ever exceeds SPINE_CHUNK elements — a
decade-of-seconds bucket span cannot materialize a multi-GB array in
one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FILL_POLICIES = ("zero", "null", "previous")

SPINE_CHUNK = 4096  # max elements of any one sequence() array


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

    groups = df.select(*group_cols).distinct()
    if bucket_min is not None and bucket_max is not None:
        bounded = groups.withColumn(
            "lo", F.lit(bucket_min).cast("long")
        ).withColumn("hi", F.lit(bucket_max).cast("long"))
    else:
        bounds = df.agg(
            (
                F.lit(bucket_min).cast("long")
                if bucket_min is not None
                else F.min(bucket_col).cast("long")
            ).alias("lo"),
            (
                F.lit(bucket_max).cast("long")
                if bucket_max is not None
                else F.max(bucket_col).cast("long")
            ).alias("hi"),
        ).where(F.col("lo").isNotNull())
        bounded = groups.crossJoin(F.broadcast(bounds))

    # two-level explode: chunk starts, then in-chunk offsets — bounds
    # every sequence() array at SPINE_CHUNK elements for any span
    spine = (
        bounded.withColumn(
            "chunk_start",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(SPINE_CHUNK))
            ),
        )
        .withColumn(
            bucket_col,
            F.explode(
                F.sequence(
                    F.col("chunk_start"),
                    F.least(
                        F.col("chunk_start") + SPINE_CHUNK - 1, F.col("hi")
                    ),
                )
            ),
        )
        .drop("lo", "hi", "chunk_start")
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
