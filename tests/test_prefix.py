"""prefix.running_sums: range-partitioned running sums == naive window,
with zero unpartitioned Window nodes in the plan (VERDICT r03 #3).

The primitive must be bit-identical to the one-task
``SUM(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` at every
partition count (partition-count invariance is the correctness proof of
the offset machinery), for both the global path (driver-side cumsum of
per-partition totals) and the grouped path (offsets window partitioned
by the real group columns).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tinybrain_spark.prefix import running_mins, running_sums

from .test_plans import assert_no_unpartitioned_windows

ROWS = [
    # (id, g, v, u): negative values, zeros, duplicate v, skewed groups
    (0, "a", 30, 1), (1, "a", -90, 2), (2, "a", 0, 3), (3, "a", 250, 4),
    (4, "a", 7, 5), (5, "a", 7, 6), (6, "a", -1, 7), (7, "a", 100, 8),
    (8, "b", 5, 9), (9, "b", 999, 10),
    (10, "c", 1, 11),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, g string, v long, u long")


@pytest.mark.parametrize("num_partitions", [None, 1, 3, 8])
def test_global_matches_naive(spark, num_partitions):
    df = _df(spark)
    out = running_sums(df, ["v", "u"], ["id"], num_partitions=num_partitions)
    got = {r.id: (r.rs_v, r.rs_u) for r in out.collect()}
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: (r.rv, r.ru)
        for r in df.withColumn("rv", F.sum("v").over(w))
        .withColumn("ru", F.sum("u").over(w))
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("num_partitions", [None, 1, 4])
def test_grouped_matches_naive(spark, num_partitions):
    df = _df(spark)
    out = running_sums(
        df, ["v"], ["id"], partition_cols=["g"], num_partitions=num_partitions
    )
    got = {r.id: r.rs_v for r in out.collect()}
    w = Window.partitionBy("g").orderBy("id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {r.id: r.rs for r in df.withColumn("rs", F.sum("v").over(w)).collect()}
    assert got == want


def test_multi_order_cols(spark):
    df = _df(spark).select(
        (F.col("id") % 3).alias("t"), "id", "g", "v"
    )
    out = running_sums(df, ["v"], ["t", "id"], num_partitions=3)
    got = {r.id: r.rs_v for r in out.collect()}
    w = Window.orderBy("t", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.id: r.rs for r in df.withColumn("rs", F.sum("v").over(w)).collect()}
    assert got == want


def test_empty_input(spark):
    df = _df(spark).where(F.lit(False))
    assert running_sums(df, ["v"], ["id"], num_partitions=2).count() == 0
    assert (
        running_sums(
            df, ["v"], ["id"], partition_cols=["g"], num_partitions=2
        ).count()
        == 0
    )


def test_preserves_other_columns_and_rows(spark):
    df = _df(spark)
    out = running_sums(df, ["v"], ["id"], num_partitions=3)
    assert out.count() == len(ROWS)
    assert set(out.columns) == {"id", "g", "v", "u", "rs_v"}


def test_plan_has_no_unpartitioned_windows(spark):
    df = _df(spark)
    assert_no_unpartitioned_windows(
        running_sums(df, ["v"], ["id"], num_partitions=3)
    )
    assert_no_unpartitioned_windows(
        running_sums(
            df, ["v"], ["id"], partition_cols=["g"], num_partitions=3
        )
    )


@pytest.mark.parametrize("num_partitions", [None, 1, 3, 8])
def test_running_mins_global_matches_naive(spark, num_partitions):
    df = _df(spark)
    out = running_mins(df, ["v"], ["id"], num_partitions=num_partitions)
    got = {r.id: r.rm_v for r in out.collect()}
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: r.rm
        for r in df.withColumn("rm", F.min("v").over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("num_partitions", [None, 1, 4])
def test_running_mins_grouped_matches_naive(spark, num_partitions):
    df = _df(spark)
    out = running_mins(
        df, ["v"], ["id"], partition_cols=["g"], num_partitions=num_partitions
    )
    got = {r.id: r.rm_v for r in out.collect()}
    w = Window.partitionBy("g").orderBy("id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r.id: r.rm
        for r in df.withColumn("rm", F.min("v").over(w)).collect()
    }
    assert got == want


def test_running_mins_plan_and_columns(spark):
    df = _df(spark)
    out = running_mins(df, ["v"], ["id"], num_partitions=3)
    assert set(out.columns) == {"id", "g", "v", "u", "rm_v"}
    assert_no_unpartitioned_windows(out)
    assert_no_unpartitioned_windows(
        running_mins(
            df, ["v"], ["id"], partition_cols=["g"], num_partitions=3
        )
    )


def test_cusum_closed_form_matches_recurrence(spark):
    """S_i = max(0, S_{i-1} + dev_i)  ==  R_i - min(0, min_{j<=i} R_j):
    the algebraic identity q_cusum_alarm rests on, checked against the
    literal sequential recurrence on a sign-mixed series."""
    devs = [30, -90, 0, 250, 7, 7, -1, 100, -400, 5, 999, 1]
    s, want = 0, []
    for d in devs:
        s = max(0, s + d)
        want.append(s)
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(devs)], "id long, dev long"
    )
    rs = running_sums(df, ["dev"], ["id"], num_partitions=3)
    rm = running_mins(rs, ["rs_dev"], ["id"], num_partitions=3)
    out = rm.withColumn(
        "s", F.col("rs_dev") - F.least(F.lit(0).cast("long"),
                                       F.col("rm_rs_dev"))
    )
    got = [r.s for r in out.orderBy("id").collect()]
    assert got == want


def test_naive_window_is_flagged_by_the_pin(spark):
    """The detector itself must catch the funnel it pins against."""
    df = _df(spark)
    bad = df.withColumn("rs", F.sum("v").over(Window.orderBy("id")))
    with pytest.raises(AssertionError):
        assert_no_unpartitioned_windows(bad)


# --- running_sums_bucketed (r06) -------------------------------------


def _bucketed_df(spark):
    # bucket = id DIV 3: monotone in the order column within each group
    rows = [(i, "a" if i % 2 == 0 else "b", (i * 37) % 11 - 5, i // 3)
            for i in range(25)]
    return spark.createDataFrame(rows, "id long, g string, v long, b long")


def test_bucketed_matches_naive(spark):
    from tinybrain_spark.prefix import running_sums_bucketed

    df = _bucketed_df(spark)
    out = running_sums_bucketed(df, ["v"], ["id"], "b", ["g"])
    got = {r.id: r.rs_v for r in out.collect()}
    w = Window.partitionBy("g").orderBy("id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r.id: r.rs for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_bucketed_multi_sum_cols_and_plan(spark):
    from tinybrain_spark.prefix import running_sums_bucketed

    df = _bucketed_df(spark).withColumn("one", F.lit(1).cast("long"))
    out = running_sums_bucketed(df, ["v", "one"], ["id"], "b", ["g"])
    assert_no_unpartitioned_windows(out)
    rows = out.collect()
    # rs_one is the 1-based running position within the group
    for g in ("a", "b"):
        seq = sorted([r for r in rows if r.g == g], key=lambda r: r.id)
        assert [r.rs_one for r in seq] == list(range(1, len(seq) + 1))


def test_bucketed_requires_partition_cols(spark):
    from tinybrain_spark.prefix import running_sums_bucketed

    with pytest.raises(ValueError, match="partition_cols"):
        running_sums_bucketed(_bucketed_df(spark), ["v"], ["id"], "b", [])
