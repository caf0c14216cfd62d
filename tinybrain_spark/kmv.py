"""KMV (k-minimum-values) distinct sketch as DataFrame operators.

The fourth mergeable sketch in the engine (bloom.py = membership,
streaming CMS = frequency, HLL caggs = distinct): a KMV sketch of a set
is the k SMALLEST distinct 32-bit hashes of its members.  Unlike HLL it
supports SET OPERATIONS — the k-min of a union is computable from the
two sketches alone, and intersection size follows from how many of the
union's k-min appear in both sides (Beyer et al., SIGMOD'07).

Everything here is DETERMINISTIC integer arithmetic (md5-derived
hashes, truncating division), so estimates are reproducible bit-for-bit
in DuckDB — the sketches are graded under the value-hash oracle, not
just rows-only.

Estimator: with t = k-th smallest hash over domain H = 2^32,
``est = (k-1) * (H // t)`` (the (k-1)/t unbiased form, integer-division
order fixed so both engines agree; when a set has fewer than k distinct
members the sketch IS the set and the estimate is exact).

Scale shape: build is the salted two-phase k-min — distinct (group,
hash) first, a bounded row_number window per (group, salt) keeps k
candidates per salt lane, and the final per-group fold sorts at most
``salt_buckets * k`` values in-row (array ops, no second wide shuffle).
Merge/union/intersection are in-row array expressions over k-length
arrays: pair analytics never reshuffle the corpus.

Reference analog: none (tinybrain has no sketch structures); public
algorithm, same evidence class as the CMS/bloom additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

H_DOMAIN = 1 << 32  # md5 8-hex-char window: hashes are uniform in [0, 2^32)


def hash32(col) -> "F.Column":
    """Deterministic 32-bit non-negative hash, replicable in DuckDB as
    ``CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def build_kmv(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-group KMV sketch: ``(group_cols..., kmin array<long>)`` with
    the k smallest distinct hashes of ``value_col`` (fewer when the
    group has fewer distinct members).

    Two-phase: distinct (group, h) bounds the width, then a row_number
    window per (group, salt) keeps k per lane — each lane's sort is a
    spillable partition sort over ~1/salt_buckets of the group — and the
    final fold concatenates the lanes in-row and keeps the global k.
    """
    from pyspark.sql import Window

    gh = df.select(*group_cols, hash32(F.col(value_col)).alias("h")).distinct()
    lane = (F.col("h") % salt_buckets).alias("_lane")
    w = Window.partitionBy(*group_cols, "_lane").orderBy("h")
    partial = (
        gh.select(*group_cols, "h", lane)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*group_cols, "_lane")
        .agg(F.sort_array(F.collect_list("h")).alias("_lane_kmin"))
    )
    return partial.groupBy(*group_cols).agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("_lane_kmin"))),
            1,
            k,
        ).alias("kmin")
    )


def _exact_div(num, den):
    """Integer floor division of non-negative longs WITHOUT float
    hazards: subtracting pmod makes the numerator an exact multiple, so
    the IEEE division result is the exact integer (a bare ``num / den``
    is double division whose 2^-52-ulp error can cross an integer
    boundary and break oracle parity)."""
    return ((num - F.pmod(num, den)) / den).cast("long")


def kmv_estimate(kmin, k: int):
    """Distinct-count estimate from a k-min array (in-row expression).

    Exact when the sketch holds the whole set (size < k); otherwise the
    (k-1)/t estimator with integer division: (k-1) * (H // t)."""
    t = F.element_at(kmin, k)
    return F.when(F.size(kmin) < k, F.size(kmin).cast("long")).otherwise(
        F.lit(k - 1).cast("long")
        * _exact_div(F.lit(H_DOMAIN).cast("long"), t)
    )


def kmv_merge(a, b, k: int):
    """k-min of the UNION of two sketches (in-row): distinct-merge the
    arrays, keep the k smallest.  Associative and commutative — sketches
    accrete across days/sources exactly like bloom's bit_or."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_union_intersect(df: DataFrame, a: str, b: str, k: int) -> DataFrame:
    """Add union/intersection estimates for two sketch columns:

    * ``union_est`` — estimate over the merged sketch.
    * ``n_common`` — members of the merged k-min present in BOTH input
      sketches (every one is a REAL shared member: hashes below both
      sides' thresholds are fully observed).
    * ``intersect_est`` — n_common * union_est // k (the Jaccard-scaled
      estimator, integer division).
    """
    merged = kmv_merge(F.col(a), F.col(b), k)
    out = df.withColumn("_m", merged)
    n_common = F.size(
        F.array_intersect(F.array_intersect(F.col("_m"), F.col(a)), F.col(b))
    )
    union_est = kmv_estimate(F.col("_m"), k)
    return (
        out.withColumn("union_est", union_est.cast("long"))
        .withColumn("n_common", n_common.cast("long"))
        .withColumn(
            "intersect_est",
            _exact_div(
                F.col("n_common") * F.col("union_est"),
                F.lit(k).cast("long"),
            ),
        )
        .drop("_m")
    )


def pairwise_overlap(
    sketches: DataFrame, group_col: str, k: int
) -> DataFrame:
    """All-pairs overlap estimates from per-group KMV sketches: the
    scale path for overlap matrices past the in-row exact bound.

    Input is ``build_kmv`` output — ONE ROW PER GROUP — so the pair
    join is a broadcast self-join of a |groups|-row table (the corpus
    never reshuffles; it was consumed once building the sketches).
    Emits, for every unordered pair (a < b) whose sketches share at
    least one observed hash::

        (group_a, group_b, total_a, total_b, shared, jaccard_permille)

    where totals and ``shared`` are KMV estimates (``kmv_estimate`` /
    the Jaccard-scaled intersect estimator) and ``jaccard_permille``
    uses the same ``1000 * shared DIV (total_a + total_b - shared)``
    formula as the exact path, over the estimated values.  Everything
    is deterministic integer math — the merge law
    ``kmv(A ∪ B) == kmv_merge(kmv(A), kmv(B))`` is pinned in tests.
    Output stays |groups|^2/2 rows regardless of corpus size.
    """
    a = sketches.select(
        F.col(group_col).alias("_ga"), F.col("kmin").alias("ka")
    )
    b = sketches.select(
        F.col(group_col).alias("_gb"), F.col("kmin").alias("kb")
    )
    pairs = a.join(F.broadcast(b), F.col("_ga") < F.col("_gb"))
    est = kmv_union_intersect(pairs, "ka", "kb", k).where(
        F.col("n_common") >= 1
    )
    ta = kmv_estimate(F.col("ka"), k)
    tb = kmv_estimate(F.col("kb"), k)
    return est.select(
        F.col("_ga").alias("group_a"),
        F.col("_gb").alias("group_b"),
        ta.cast("long").alias("total_a"),
        tb.cast("long").alias("total_b"),
        F.col("intersect_est").alias("shared"),
    ).withColumn(
        # estimates can wobble independently, so clamp the union-size
        # denominator at 1 (exact counts can never make it nonpositive,
        # estimated ones could in a degenerate tiny-set corner)
        "jaccard_permille",
        _exact_div(
            F.lit(1000).cast("long") * F.col("shared"),
            F.greatest(
                F.col("total_a") + F.col("total_b") - F.col("shared"),
                F.lit(1).cast("long"),
            ),
        ),
    )
