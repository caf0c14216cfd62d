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


# ---------------------------------------------------------------------------
# remote-FS catalog (file:// scheme exercises every non-local branch —
# Hadoop FileSystem API + Spark-scan metadata fallbacks — on local disk)
# ---------------------------------------------------------------------------


@pytest.fixture()
def remote_catalog(spark, workdir):
    return Catalog(spark, f"file://{workdir}/remote")


def test_remote_scheme_catalog_roundtrip(spark, remote_catalog):
    cat = remote_catalog
    assert not cat.is_local
    assert not cat.exists("t")
    cat.write(_mk(spark, [("a", 1, "x"), ("b", 1, "y")]), "t",
              partition_by=("source",), mode="overwrite")
    assert cat.exists("t")
    assert _rows(cat.read("t")) == [("a", 1, "x"), ("b", 1, "y")]
    delta = _mk(spark, [("b", 1, "b-new"), ("c", 1, "c1")])
    cat.write(delta, "t", partition_by=("source",),
              mode="overwrite_partitions")
    assert _rows(cat.read("t")) == sorted(
        [("a", 1, "x"), ("b", 1, "b-new"), ("c", 1, "c1")]
    )
    cat.drop("t")
    assert not cat.exists("t")


def test_remote_retention_swap_and_metadata_fallbacks(spark, remote_catalog):
    """On a URI-scheme catalog the footer shortcuts must fall back to
    Spark scans (NOT silently return {} / rows_kept=0), and the staging
    swap must go through dynamic partition overwrite — including
    dropping a touched partition whose every row expired."""
    from tinybrain_spark.retention import (
        RetentionPolicy,
        _footer_column_max,
        _footer_row_counts,
        enforce_retention,
    )

    cat = remote_catalog
    rows = (
        [("a", b, f"a{b}") for b in range(10)]
        + [("b", b, f"b{b}") for b in range(5)]
        + [("c", 9, "c9")]
    )
    df = spark.createDataFrame(rows, "source string, time_bucket long, v string")
    cat.write(df, "tier", partition_by=("source",), mode="overwrite")

    assert _footer_column_max(cat, "tier", "time_bucket") is None
    assert sum(_footer_row_counts(cat, "tier").values()) == 16

    stats = enforce_retention(cat, "tier", 1, RetentionPolicy({1: 3}))
    spark.catalog.clearCache()
    assert stats == {"cutoff": 7, "rows_dropped": 12, "rows_kept": 4}
    got = sorted(
        (r["source"], r["time_bucket"]) for r in cat.read("tier").collect()
    )
    # a partially expired (keeps 7-9), b FULLY expired (partition gone),
    # c untouched
    assert got == [("a", 7), ("a", 8), ("a", 9), ("c", 9)]
    assert not cat.exists("tier__retention_staging")


def test_retention_stale_staging_from_crashed_run_is_ignored(spark, catalog):
    """Crash-safety of the parquet-fallback swap: a stale staging table
    left by a run that died between the staging write and the swap must
    be dropped by the next run, never merged into the live table."""
    from tinybrain_spark.retention import RetentionPolicy, enforce_retention

    df = spark.createDataFrame(
        [("a", b, f"a{b}") for b in range(10)],
        "source string, time_bucket long, v string",
    )
    catalog.write(df, "tier", partition_by=("source",), mode="overwrite")
    junk = spark.createDataFrame(
        [("zzz", 999, "junk")], "source string, time_bucket long, v string"
    )
    catalog.write(junk, "tier__retention_staging",
                  partition_by=("source",), mode="overwrite")

    enforce_retention(catalog, "tier", 1, RetentionPolicy({1: 2}))
    spark.catalog.clearCache()
    got = sorted(
        (r["source"], r["time_bucket"])
        for r in catalog.read("tier").collect()
    )
    assert got == [("a", 8), ("a", 9)]
    assert not catalog.exists("tier__retention_staging")


def test_remote_compact_swap(spark, remote_catalog):
    cat = remote_catalog
    df = _mk(spark, [("a", i, f"v{i}") for i in range(64)]).repartition(8)
    cat.write(df, "t", partition_by=("source",), mode="overwrite")
    n = cat.compact("t", partition_by=("source",), target_partitions=1)
    spark.catalog.clearCache()
    assert n == 1
    assert cat.read("t").count() == 64
