"""global_rank: dense total-order position without a one-task sort."""

from pyspark.sql import functions as F

from tinybrain_spark.ranking import global_rank

ROWS = [
    ("w%03d" % i, (i * 37) % 50) for i in range(120)
]  # heavy ties on n -> word breaks them


def test_global_rank_matches_sorted_order(spark):
    df = spark.createDataFrame(ROWS, "word string, n long").repartition(7)
    got = {
        r["word"]: r["rank"]
        for r in global_rank(
            df, [F.col("n").desc(), F.col("word").asc()], num_partitions=5
        ).collect()
    }
    want = {
        w: i + 1
        for i, (w, n) in enumerate(
            sorted(ROWS, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == want


def test_global_rank_partition_count_invariance(spark):
    df = spark.createDataFrame(ROWS, "word string, n long")
    order = [F.col("n").desc(), F.col("word").asc()]
    a = {r["word"]: r["rank"]
         for r in global_rank(df, order, num_partitions=2).collect()}
    b = {r["word"]: r["rank"]
         for r in global_rank(df.repartition(13), order,
                              num_partitions=9).collect()}
    assert a == b


def test_every_window_in_rank_plan_is_partitioned(spark):
    """No unpartitioned (one-task) window: the only full-data window
    partitions by _pid; the offsets window runs over one row per
    partition."""
    df = spark.createDataFrame(ROWS, "word string, n long")
    plan = (
        global_rank(df, [F.col("n").desc(), F.col("word").asc()],
                    num_partitions=5)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    import re

    for w in re.findall(r"Window \[.*", plan):
        if "row_number" in w:
            assert "_pid" in w, w
