"""intervals.interval_join: bucket-expanded equi-join == naive
non-equi join, at every granularity (granularity invariance is the
correctness proof of the bucket decomposition), and the plan never
degenerates to a nested-loop/cartesian join.
"""

import pytest
from pyspark.sql import functions as F

from tinybrain_spark.intervals import interval_join

POINTS = [
    # (k, t, pid)
    ("a", 0, 0), ("a", 99, 1), ("a", 100, 2), ("a", 250, 3),
    ("a", 3600, 4), ("a", 5000, 5),
    ("b", 100, 6), ("b", 101, 7), ("b", 9999, 8),
    ("c", 42, 9),
]
INTERVALS = [
    # (k, start, end, iid): overlapping, nested, point-width, empty,
    # inverted (dropped), bucket-straddling
    ("a", 50, 150, 100), ("a", 100, 100, 101), ("a", 0, 5000, 102),
    ("a", 200, 199, 103),  # inverted: matches nothing
    ("b", 90, 110, 104), ("b", 9000, 12000, 105),
    ("d", 0, 10, 106),  # key with no points
]


def _dfs(spark):
    pts = spark.createDataFrame(POINTS, "k string, t long, pid long")
    ivs = spark.createDataFrame(
        INTERVALS, "k string, start long, end long, iid long"
    )
    return pts, ivs


def _naive(pts, ivs, keys=True):
    out = set()
    for k, t, pid in POINTS:
        for ik, s, e, iid in INTERVALS:
            if (not keys or ik == k) and s <= t <= e:
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("granularity", [1, 7, 100, 3600, 10**9])
def test_matches_naive_any_granularity(spark, granularity):
    pts, ivs = _dfs(spark)
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            pts, ivs, granularity=granularity, keys=["k"]
        ).collect()
    }
    assert got == _naive(pts, ivs)


def test_keyless_join(spark):
    pts, ivs = _dfs(spark)
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            pts, ivs.drop("k"), granularity=64
        ).collect()
    }
    assert got == _naive(pts, ivs, keys=False)


def test_left_join_keeps_unmatched_points(spark):
    pts, ivs = _dfs(spark)
    rows = interval_join(
        pts, ivs, granularity=100, keys=["k"], how="left"
    ).collect()
    matched = _naive(pts, ivs)
    got_pairs = {(r.pid, r.iid) for r in rows if r.iid is not None}
    assert got_pairs == matched
    unmatched_pids = {r.pid for r in rows if r.iid is None}
    assert unmatched_pids == {p for (_, _, p) in POINTS} - {
        pid for pid, _ in matched
    }
    # c/42 matches no interval; must survive with null interval cols
    assert 9 in unmatched_pids


def test_plan_is_equi_join_not_nested_loop(spark):
    pts, ivs = _dfs(spark)
    df = interval_join(pts, ivs, granularity=100, keys=["k"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bad_how_raises(spark):
    pts, ivs = _dfs(spark)
    with pytest.raises(ValueError, match="inner|left"):
        interval_join(pts, ivs, how="full")
