"""Catalog shim contract: with no Iceberg jar in the sandbox, the
engine's resume path uses parquet dynamic partition overwrite.  These
tests pin that its semantics equal what an Iceberg
`MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT` keyed on
the partition column would produce, so swapping the backend cannot
change results (VERDICT r01 item 9; SURVEY.md §7 risk 'Iceberg offline
availability')."""

import pytest
from pyspark.sql import functions as F

from tinybrain_spark.catalog import Catalog


def _rows(df):
    return sorted((r["source"], r["k"], r["v"]) for r in df.collect())


@pytest.fixture()
def catalog(spark, workdir):
    return Catalog(spark, workdir)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "source string, k long, v string")


def test_partition_overwrite_equals_merge(spark, catalog):
    """Recomputing one partition + adding a new one must behave like a
    partition-keyed MERGE: untouched partitions byte-identical, touched
    partitions fully replaced (stale rows gone), new partitions added."""
    initial = _mk(
        spark,
        [("a", 1, "a1"), ("a", 2, "a2"), ("b", 1, "b1-stale"),
         ("b", 2, "b2-stale"), ("b", 3, "b3-stale")],
    )
    catalog.write(initial, "t", partition_by=("source",), mode="overwrite")

    # the resume rewrite: partition b recomputed (FEWER rows — stale
    # extras must vanish), partition c is new, partition a untouched
    delta = _mk(spark, [("b", 1, "b1-new"), ("c", 1, "c1")])
    catalog.write(delta, "t", partition_by=("source",),
                  mode="overwrite_partitions")

    # the MERGE oracle, computed independently: delete-then-insert per
    # partition present in the delta
    expected = sorted(
        [("a", 1, "a1"), ("a", 2, "a2"), ("b", 1, "b1-new"), ("c", 1, "c1")]
    )
    assert _rows(catalog.read("t")) == expected


def test_overwrite_partitions_is_idempotent(spark, catalog):
    """Re-running a completed partition's write (the crash-replay case)
    must be a no-op in content — the exactly-once property resume
    relies on."""
    df = _mk(spark, [("a", 1, "a1"), ("b", 1, "b1")])
    catalog.write(df, "t", partition_by=("source",), mode="overwrite")
    replay = _mk(spark, [("b", 1, "b1")])
    for _ in range(2):
        catalog.write(replay, "t", partition_by=("source",),
                      mode="overwrite_partitions")
        assert _rows(catalog.read("t")) == [("a", 1, "a1"), ("b", 1, "b1")]


def test_empty_delta_touches_nothing(spark, catalog):
    """A resume run with zero pending partitions must leave every
    existing partition intact (MERGE with an empty source)."""
    df = _mk(spark, [("a", 1, "a1"), ("b", 1, "b1")])
    catalog.write(df, "t", partition_by=("source",), mode="overwrite")
    empty = _mk(spark, []).where(F.lit(False))
    catalog.write(empty, "t", partition_by=("source",),
                  mode="overwrite_partitions")
    assert _rows(catalog.read("t")) == [("a", 1, "a1"), ("b", 1, "b1")]


def test_append_accumulates(spark, catalog):
    catalog.write(_mk(spark, [("a", 1, "x")]), "t",
                  partition_by=("source",), mode="append")
    catalog.write(_mk(spark, [("a", 2, "y")]), "t",
                  partition_by=("source",), mode="append")
    assert _rows(catalog.read("t")) == [("a", 1, "x"), ("a", 2, "y")]


def test_bucketed_join_is_exchange_free(spark, catalog):
    """Two tables bucketed on the same key must sort-merge join with NO
    exchange on either side — the co-located-join strategy for
    repeatedly-joined fact tables."""
    from pyspark.sql import functions as F

    a = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("va")
    )
    b = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 31).alias("vb")
    )
    catalog.write_bucketed(a, "tb_bucket_a", ("doc_id",), 8, ("doc_id",))
    catalog.write_bucketed(b, "tb_bucket_b", ("doc_id",), 8, ("doc_id",))
    try:
        # hint sort-merge (tiny test tables would otherwise broadcast —
        # at real fact-table sizes SMJ is what the planner picks anyway)
        joined = catalog.read_table("tb_bucket_a").hint("merge").join(
            catalog.read_table("tb_bucket_b").hint("merge"), "doc_id"
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # no shuffle on either side
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_bucket_a")
        spark.sql("DROP TABLE IF EXISTS tb_bucket_b")
