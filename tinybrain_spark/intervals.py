"""Interval (range-overlap) join — bucket-expanded equi-join.

``point.t BETWEEN interval.start AND interval.end`` is a non-equi
predicate: written directly, Spark plans a BroadcastNestedLoopJoin (or
a cartesian product) — O(|points| * |intervals|) comparisons, the
classic range-join trap at any real volume.

The scale shape: quantize time into fixed buckets of ``granularity``
seconds, EXPLODE each interval to every bucket it covers (fan-out =
interval length / granularity, bounded by construction), equi-join
points to interval-buckets on (keys..., bucket) — hash-partitionable,
AQE-broadcastable, skew-saltable like any equi-join — then refine with
the exact BETWEEN predicate.  Pick ``granularity`` near the median
interval length: fan-out stays O(1) per interval while each point
meets only intervals within one bucket of it.  (Same decomposition as
Spark's own range-join-hint optimization in Databricks runtime and the
binning used by genomics/geo engines; composed here from public
DataFrame ops.)

No reference analog (tinybrain has no relational layer); engine
surface for the timeseries/maintenance-window join class
(q_interval_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str = "t",
    start_col: str = "start",
    end_col: str = "end",
    granularity: int = 3600,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= t <= end``), matching ``keys`` equal too when given.

    Both ``t`` and the bounds must be non-negative integers (epoch
    seconds in the engine's convention; ``DIV`` disagrees across
    engines below zero).  Zero- or negative-length intervals
    (``end < start``) match nothing and are dropped before the explode
    — guarded explicitly because ``F.sequence(a, b)`` SILENTLY steps
    -1 when b < a, which would fabricate buckets.

    ``how='left'`` keeps unmatched points with null interval columns
    (dashboard overlays); default inner.  Interval columns are kept;
    name collisions with point columns are the caller's to alias."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    ks = list(keys or [])
    b_pts = points.withColumn("_b", F.expr(f"{t_col} DIV {granularity}"))
    iv = intervals.where(F.col(end_col) >= F.col(start_col))
    b_iv = iv.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {granularity}"),
                F.expr(f"{end_col} DIV {granularity}"),
            )
        ),
    )
    on = [*ks, "_b"]
    joined = b_pts.join(b_iv, on, how="inner").where(
        F.col(t_col).between(F.col(start_col), F.col(end_col))
    )
    if how == "inner":
        return joined.drop("_b")
    matched = joined.drop("_b")
    iv_cols = [c for c in b_iv.columns if c not in (*ks, "_b")]
    missing = b_pts.drop("_b").join(
        matched.select(*points.columns).distinct(),
        on=list(points.columns),
        how="left_anti",
    )
    for c in iv_cols:
        missing = missing.withColumn(c, F.lit(None).cast(dict(
            (f.name, f.dataType) for f in b_iv.schema.fields)[c]))
    return matched.unionByName(missing)
