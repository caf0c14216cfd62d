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
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Return ``left`` with, for each row, the matched ``value_cols``
    from ``right`` per ``keys``; NULLs where nothing matches.

    * ``direction="backward"`` (default): most recent right row with
      ``right_time <= left_time``.
    * ``direction="forward"``: earliest right row with
      ``right_time >= left_time``.
    * ``direction="nearest"``: whichever of the two is closer in time;
      exact ties go BACKWARD (pandas ``merge_asof`` nearest semantics).
    * ``tolerance``: maximum allowed |gap| in time units — a match
      farther away comes back NULL (pandas ``merge_asof`` semantics).

    Either single direction stays one shuffle + one sort: right rows
    sort just BEFORE left rows at equal times for backward (running
    ``last``), just AFTER for forward (running ``first`` over the
    following frame), so at-or-equal matches are included without a
    range join.  ``nearest`` computes both candidates over the SAME
    per-key exchange — two sorts (asc + desc running frames, both
    incremental; never the O(n^2) UnboundedFollowing frame) but still
    a single shuffle, then picks per row by |gap|.
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, keys, left_time, right_time, value_cols, tolerance
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
    fwd = direction == "forward"
    lcols = [c for c in left.columns]
    probe_vals = [f"_v_{c}" for c in value_cols] + ["_vt"]
    l_tagged = left.select(
        *lcols,
        F.col(left_time).cast("long").alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols],
        F.lit(None).cast("long").alias("_vt"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_time).cast("long").alias("_t"),
        F.lit(2 if fwd else 0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        F.col(right_time).cast("long").alias("_vt"),
    )
    for c in lcols:
        if c not in keys:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = l_tagged.unionByName(r_tagged)
    if fwd:
        # forward = DESC-ordered running `last`, NOT `first` over a
        # [current, unbounded following] frame: Spark evaluates the
        # UnboundedFollowing frame by re-scanning current->end for
        # EVERY row — O(n^2) per partition, found live by the sf1
        # sweep (q_asof_fwd pinned a JVM for an hour at 2*10^5 rows
        # per key).  The desc sort flips it into the incremental
        # UnboundedPreceding frame (O(n)); `_side` desc keeps the
        # equal-time right row visible to its left row (at-or-after
        # includes equality).
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").desc(), F.col("_side").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        picked = {
            v: F.last(F.col(v), ignorenulls=True).over(w)
            for v in probe_vals
        }
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy("_t", "_side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        picked = {
            v: F.last(F.col(v), ignorenulls=True).over(w)
            for v in probe_vals
        }
    filled = unioned.select(
        *lcols,
        "_side",
        "_t",
        *[picked[f"_v_{c}"].alias(c) for c in value_cols],
        picked["_vt"].alias("_mt"),
    )
    out = filled.where(F.col("_side").isin(1)).drop("_side")
    if tolerance is not None:
        gap = F.abs(F.col("_mt") - F.col("_t"))
        out = out.select(
            *lcols,
            *[
                F.when(gap <= tolerance, F.col(c)).alias(c)
                for c in value_cols
            ],
        )
    else:
        out = out.drop("_t", "_mt")
    return out


def asof_both(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Both-direction as-of scan: each left row annotated with BOTH
    its backward neighbor (latest right row at-or-before) and its
    forward neighbor (earliest right row at-or-after) per ``keys``.

    Returns ``left``'s columns plus ``_t`` (left time as long) and,
    for each value column ``c``: ``_b_v_c`` / ``_f_v_c`` (backward /
    forward neighbor values, NULL where unmatched) and ``_b_vt`` /
    ``_f_vt`` (the matched right times).  One union, ONE exchange on
    ``keys``, two INCREMENTAL window passes (asc running last =
    backward candidate, desc running last = forward candidate —
    never the O(n^2) UnboundedFollowing frame).

    A single ``_side`` tagging serves both scans: right rows carry 0,
    left rows 1, and each window breaks equal-time ties with
    ``_side`` ASC so the right row is visible to its equal-time left
    row in BOTH directions (at-or-equal matches both ways, like
    pandas ``merge_asof(direction="nearest")``).  This is the shared
    engine under ``direction="nearest"`` and interpolated as-of."""
    lcols = [c for c in left.columns]
    probe = [f"_v_{c}" for c in value_cols] + ["_vt"]
    l_tagged = left.select(
        *lcols,
        F.col(left_time).cast("long").alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols],
        F.lit(None).cast("long").alias("_vt"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_time).cast("long").alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        F.col(right_time).cast("long").alias("_vt"),
    )
    for c in lcols:
        if c not in keys:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = l_tagged.unionByName(r_tagged)
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return unioned.select(
        *lcols,
        "_side",
        "_t",
        *[F.last(F.col(v), ignorenulls=True).over(wb).alias(f"_b{v}")
          for v in probe],
        *[F.last(F.col(v), ignorenulls=True).over(wf).alias(f"_f{v}")
          for v in probe],
    ).where(F.col("_side") == 1).drop("_side")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance: int | None,
) -> DataFrame:
    """Nearest-direction as-of over the shared ``asof_both`` scan:
    per-row pick by absolute gap with exact ties going backward."""
    lcols = [c for c in left.columns]
    both = asof_both(left, right, keys, left_time, right_time, value_cols)

    bgap = F.col("_t") - F.col("_b_vt")   # >= 0 when backward matched
    fgap = F.col("_f_vt") - F.col("_t")   # >= 0 when forward matched
    use_b = F.col("_b_vt").isNotNull() & (
        F.col("_f_vt").isNull() | (bgap <= fgap)
    )
    picked_gap = F.when(use_b, bgap).otherwise(fgap)
    keep = (
        F.lit(True)
        if tolerance is None
        else (picked_gap <= F.lit(tolerance))
    )
    return both.select(
        *lcols,
        *[
            F.when(
                keep & use_b, F.col(f"_b_v_{c}")
            ).when(
                keep & ~use_b, F.col(f"_f_v_{c}")
            ).alias(c)
            for c in value_cols
        ],
    )
