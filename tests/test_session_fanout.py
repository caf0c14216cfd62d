"""session.load_table scan fan-out (r06): the conditional hash
repartition that spreads single-row-group scans across cores.

The decision must be layout-driven (parquet row groups are the atomic
scan unit) and scale-adaptive: wide layouts and small inputs keep
their plans byte-identical to the pre-r06 shape.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tinybrain_spark.session import _parquet_layout, load_table


def _write(path, n_rows, row_group_size=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pa.table({"doc_id": pa.array(range(n_rows), type=pa.int64()),
                  "text": pa.array(["w " * 5] * n_rows)})
    pq.write_table(t, path, row_group_size=row_group_size or n_rows)


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_layout_reads_footers(tmp_path):
    p = str(tmp_path / "sf" / "documents.parquet")
    _write(p, 64, row_group_size=8)
    splits, rows = _parquet_layout(p)
    assert splits == 8 and rows == 64


def test_fanout_fires_on_narrow_layout(spark, tmp_path):
    sf = str(tmp_path / "sf")
    _write(os.path.join(sf, "documents.parquet"), 100)  # 1 row group
    df = load_table(spark, sf, "documents", fanout_on=["doc_id"],
                    fanout_min_rows=10)
    plan = _plan(df)
    assert "hashpartitioning(doc_id" in plan, plan


def test_fanout_respects_row_floor(spark, tmp_path):
    sf = str(tmp_path / "sf")
    _write(os.path.join(sf, "documents.parquet"), 100)
    df = load_table(spark, sf, "documents", fanout_on=["doc_id"],
                    fanout_min_rows=1000)
    assert "hashpartitioning" not in _plan(df)


def test_fanout_skips_wide_layouts(spark, tmp_path):
    # splits >= cores: a production-shaped table never pays the
    # exchange, whatever the row count
    sf = str(tmp_path / "sf")
    cores = spark.sparkContext.defaultParallelism
    _write(os.path.join(sf, "documents.parquet"), 64 * cores, row_group_size=8)
    df = load_table(spark, sf, "documents", fanout_on=["doc_id"],
                    fanout_min_rows=1)
    assert "hashpartitioning" not in _plan(df)


def test_fanout_empty_list_suppresses_default(spark, tmp_path):
    sf = str(tmp_path / "sf")
    # enough rows that the documents default (16384) would fire
    _write(os.path.join(sf, "documents.parquet"), 20000)
    fan = load_table(spark, sf, "documents")
    off = load_table(spark, sf, "documents", fanout_on=[])
    assert "hashpartitioning(doc_id" in _plan(fan)
    assert "hashpartitioning" not in _plan(off)


def test_fanout_rows_match_plain_read(spark, tmp_path):
    sf = str(tmp_path / "sf")
    _write(os.path.join(sf, "documents.parquet"), 500)
    fan = load_table(spark, sf, "documents", fanout_on=["doc_id"],
                     fanout_min_rows=10)
    assert sorted(r.doc_id for r in fan.collect()) == list(range(500))
