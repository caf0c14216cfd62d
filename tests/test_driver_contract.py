"""Driver-contract smoke: entry() runs, registry is consistent, and a
sample of queries match their DuckDB oracles at sf0.001 (the full sweep
lives in tools/check_oracle.py and runs at sf0.01 in the round gate)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import __spark_entry__ as entrymod
from check_oracle import _duck_con, compare

SF_DIR = "/root/testdata/sf0.001"

SAMPLE = [
    "q_avg_rollup_t1",
    "q_avg_sparse_t1",
    "q_mode_rollup_t1",
    "q_mode8_rollup_t1",
    "q_gapfill_zero",
    "q_dedup_exact",
    "q_minhash_signature",
    "q_ann_topk",
]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert df.columns == ["user_id", "tier", "pos", "token"]


def test_registry_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # only the binary-blob query is rows-only
    assert set(qs) - set(oracles) == {"q_gorilla_roundtrip"}
    assert len(qs) >= 25


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, name):
    con = _duck_con(SF_DIR)
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    odf = con.execute(entrymod.oracle_sql()[name]).df()
    assert compare(sdf, odf) == []
