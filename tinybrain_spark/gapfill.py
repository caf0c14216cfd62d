"""Gap-fill for missing time buckets (north_rule: 'gap-fill').

Builds a dense calendar spine per group with ``sequence()`` +
``explode`` (pure Catalyst — no UDF) and LEFT JOINs observed buckets
onto it.  Fill policies:

* ``zero``     — missing measures become 0
* ``null``     — keep NULLs
* ``previous`` — last-observation-carried-forward via
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window
* ``linear``   — interior gaps linearly interpolated between the
  neighboring observations (integer floor arithmetic via pmod, so
  Spark and DuckDB agree even on decreasing series where truncating
  DIV and flooring // diverge); leading gaps back-fill from the next
  observation, trailing gaps carry the last one forward

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

FILL_POLICIES = ("zero", "null", "previous", "linear")

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
    elif policy == "linear":
        wp = (
            Window.partitionBy(*group_cols)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # next-observation lookup via DESC-ordered running `last`, not
        # `first` over [current, unbounded following]: Spark re-scans
        # that frame per row (O(spine^2) per group — the asof.py sf1
        # lesson); the desc running frame is incremental.
        wn = (
            Window.partitionBy(*group_cols)
            .orderBy(F.col(bucket_col).desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out_cols = []
        for c in value_cols:
            obs_b = F.when(F.col(c).isNotNull(), F.col(bucket_col))
            pv = F.last(F.col(c), ignorenulls=True).over(wp)
            nv = F.last(F.col(c), ignorenulls=True).over(wn)
            pb = F.last(obs_b, ignorenulls=True).over(wp)
            nb = F.last(obs_b, ignorenulls=True).over(wn)
            num = (nv - pv) * (F.col(bucket_col) - pb)
            den = nb - pb
            # exact floor division: (num - pmod)/den is an exact
            # integer, so the double division below is exact too —
            # truncating DIV would disagree with the oracle's flooring
            # // whenever the series decreases across a gap
            interp = pv + ((num - F.pmod(num, den)) / den).cast("long")
            out_cols.append(
                F.when(F.col(c).isNotNull(), F.col(c))
                .when(pv.isNotNull() & nv.isNotNull(), interp)
                .when(nv.isNotNull(), nv)  # leading gap: back-fill
                .otherwise(pv)  # trailing gap: carry forward
                .alias(c)
            )
        filled = joined.select(*group_cols, bucket_col, *out_cols)
    else:
        filled = joined.select(*group_cols, bucket_col, *value_cols)

    return filled
