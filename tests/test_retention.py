"""Retention-policy enforcement: age cutoffs per tier, partition-level
deletes, fully-expired partitions removed, untouched tiers kept."""

import pytest
from pyspark.sql import functions as F

from tinybrain_spark.catalog import Catalog
from tinybrain_spark.datagen import generate
from tinybrain_spark.retention import (
    RetentionPolicy,
    enforce_pyramid_retention,
    enforce_retention,
)
from tinybrain_spark.rollup import RollupConfig, RollupEngine


@pytest.fixture(scope="module")
def pyramid(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ret") / "wh")
    df = generate(spark, n_docs=128, n_tok=64, seed=21, num_partitions=4)
    engine = RollupEngine(spark, wd)
    cfg = RollupConfig(kernel="avg", window=4, num_tiers=2, run_kind="ret")
    engine.run_pyramid(df, cfg, resume=False)
    return engine, cfg


def test_cutoff_math():
    p = RetentionPolicy({1: 10})
    assert p.cutoff(1, newest_bucket=63) == 54
    assert p.cutoff(2, newest_bucket=63) is None


def test_enforce_drops_old_buckets(spark, pyramid):
    engine, cfg = pyramid
    cat = engine.catalog
    table = cfg.name(1)
    before = cat.read(table)
    newest = before.agg(F.max("time_bucket")).first()[0]
    keep = 20
    # materialize expectations BEFORE enforcement mutates the files
    want = before.where(F.col("time_bucket") >= newest - keep + 1).count()
    stats = enforce_retention(cat, table, 1, RetentionPolicy({1: keep}))
    spark.catalog.clearCache()
    after = cat.read(table)
    assert stats["rows_dropped"] > 0
    assert after.where(F.col("time_bucket") < newest - keep + 1).count() == 0
    assert after.count() == want == stats["rows_kept"]


def test_enforce_noop_when_within_policy(spark, pyramid):
    engine, cfg = pyramid
    cat = engine.catalog
    table = cfg.name(2)
    n = cat.read(table).count()
    stats = enforce_retention(cat, table, 2, RetentionPolicy({2: 10_000}))
    assert stats["rows_dropped"] == 0
    assert cat.read(table).count() == n


def test_pyramid_retention_keeps_unlisted_tiers(spark, pyramid):
    engine, cfg = pyramid
    cat = engine.catalog
    t2_before = cat.read(cfg.name(2)).count()
    results = enforce_pyramid_retention(
        cat, "ret", num_tiers=2, policy=RetentionPolicy({1: 5})
    )
    assert results[1]["rows_dropped"] >= 0
    assert results[2]["rows_dropped"] == 0
    assert cat.read(cfg.name(2)).count() == t2_before


def test_fully_expired_source_partition_removed(spark, workdir):
    cat = Catalog(spark, workdir)
    rows = [
        ("d1", "only_old", 1, [1, 2]),
        ("d2", "mixed", 1, [3, 4]),
        ("d3", "mixed", 90, [5, 6]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, time_bucket long, tokens array<int>"
    )
    cat.write(df, "t", partition_by=("source",), mode="append")
    stats = enforce_retention(
        cat, "t", 1, RetentionPolicy({1: 10}), newest_bucket=90
    )
    assert stats["rows_dropped"] == 2
    left = cat.read("t")
    assert left.count() == 1
    assert left.first()["source"] == "mixed"
