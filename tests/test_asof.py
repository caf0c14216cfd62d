"""as-of join unit semantics (DuckDB's native ASOF JOIN is the oracle
for the driver query; these pin the tricky edges directly)."""

from pyspark.sql import functions as F

from tinybrain_spark.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k string, lt long, id long")
    right = spark.createDataFrame(right_rows, "k string, rt long, v long")
    out = asof_join(left, right, ["k"], "lt", "rt", ["v"])
    return {r["id"]: r["v"] for r in out.collect()}


def test_asof_basic(spark):
    got = _run(
        spark,
        [("a", 10, 1), ("a", 25, 2), ("a", 4, 3), ("b", 100, 4)],
        [("a", 5, 50), ("a", 20, 51), ("b", 7, 52)],
    )
    assert got == {1: 50, 2: 51, 3: None, 4: 52}


def test_asof_equal_timestamp_matches(spark):
    # at-or-before INCLUDES equality: right row at the same instant wins
    got = _run(spark, [("a", 20, 1)], [("a", 5, 50), ("a", 20, 51)])
    assert got == {1: 51}


def test_asof_carries_across_gaps(spark):
    got = _run(
        spark,
        [("a", 1_000_000, 1)],
        [("a", 3, 50)],
    )
    assert got == {1: 50}


def _run_opts(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k string, lt long, id long")
    right = spark.createDataFrame(right_rows, "k string, rt long, v long")
    out = asof_join(left, right, ["k"], "lt", "rt", ["v"], **kw)
    return {r["id"]: r["v"] for r in out.collect()}


def test_asof_forward(spark):
    # earliest right row at-or-AFTER, including equality
    got = _run_opts(
        spark,
        [("a", 10, 1), ("a", 25, 2), ("a", 4, 3), ("a", 51, 4),
         ("b", 100, 5)],
        [("a", 5, 50), ("a", 20, 51), ("a", 51, 52), ("b", 7, 53)],
        direction="forward",
    )
    assert got == {1: 51, 2: 52, 3: 50, 4: 52, 5: None}


def test_asof_backward_tolerance(spark):
    # match at distance 5 kept with tolerance 5, nulled with tolerance 4
    rows_l = [("a", 10, 1), ("a", 100, 2)]
    rows_r = [("a", 5, 50), ("a", 90, 51)]
    assert _run_opts(spark, rows_l, rows_r, tolerance=10) == {1: 50, 2: 51}
    assert _run_opts(spark, rows_l, rows_r, tolerance=4) == {1: None, 2: None}
    assert _run_opts(spark, rows_l, rows_r, tolerance=5) == {1: 50, 2: None}


def test_asof_forward_tolerance(spark):
    got = _run_opts(
        spark,
        [("a", 10, 1), ("a", 30, 2)],
        [("a", 12, 50), ("a", 90, 51)],
        direction="forward", tolerance=3,
    )
    assert got == {1: 50, 2: None}


def test_asof_nearest_picks_closer_side(spark):
    # 10 is 3 from 7 (back) and 5 from 15 (fwd) -> backward; 14 is 7
    # from 7 and 1 from 15 -> forward; 11 is equidistant (4 either
    # way) -> tie goes BACKWARD (pandas merge_asof nearest rule)
    got = _run_opts(
        spark,
        [("a", 10, 1), ("a", 14, 2), ("a", 11, 3)],
        [("a", 7, 50), ("a", 15, 51)],
        direction="nearest",
    )
    assert got == {1: 50, 2: 51, 3: 50}


def test_asof_nearest_equal_time_and_one_sided(spark):
    got = _run_opts(
        spark,
        [("a", 7, 1), ("a", 1, 2), ("a", 99, 3), ("b", 5, 4)],
        [("a", 7, 50), ("a", 20, 51)],
        direction="nearest",
    )
    # exact-time match, forward-only (before first right), backward-only
    # (after last right), and a key with no right rows at all
    assert got == {1: 50, 2: 50, 3: 51, 4: None}


def test_asof_nearest_tolerance(spark):
    got = _run_opts(
        spark,
        [("a", 10, 1), ("a", 30, 2)],
        [("a", 7, 50), ("a", 100, 51)],
        direction="nearest", tolerance=5,
    )
    # 10 is 3 from 7 (within 5); 30 is 23 from 7 and 70 from 100 ->
    # nearest is 7 but outside tolerance -> NULL
    assert got == {1: 50, 2: None}


def test_asof_differential_vs_pandas_merge_asof(spark):
    """Random series, all direction/tolerance combinations, vs pandas
    merge_asof — an independent reference implementation of exactly
    these semantics."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(17)
    for trial in range(3):
        left_rows, right_rows = [], []
        for k in ("a", "b", "c"):
            lt = np.sort(rng.choice(3000, size=40, replace=False))
            rt = np.sort(rng.choice(3000, size=25, replace=False))
            # NOTE: len(...) inside a comprehension is constant — ids
            # must be uniquified with enumerate or every row of a key
            # shares one id and the comparison dict keeps an arbitrary
            # row (collect-order luck, exposed by the r04 asof rewrite)
            left_rows += [
                (k, int(t), len(left_rows) + i) for i, t in enumerate(lt)
            ]
            right_rows += [
                (k, int(t), 1000 + len(right_rows) + i)
                for i, t in enumerate(rt)
            ]
        left = spark.createDataFrame(left_rows, "k string, lt long, id long")
        right = spark.createDataFrame(right_rows, "k string, rt long, v long")
        lpd = pd.DataFrame(left_rows, columns=["k", "lt", "id"]).sort_values(
            "lt", ignore_index=True)
        rpd = pd.DataFrame(right_rows, columns=["k", "rt", "v"]).sort_values(
            "rt", ignore_index=True)
        for direction in ("backward", "forward", "nearest"):
            for tol in (None, 100, 17):
                got = {
                    r["id"]: r["v"]
                    for r in asof_join(
                        left, right, ["k"], "lt", "rt", ["v"],
                        direction=direction, tolerance=tol,
                    ).collect()
                }
                ref = pd.merge_asof(
                    lpd, rpd, left_on="lt", right_on="rt", by="k",
                    direction=direction,
                    tolerance=None if tol is None else tol,
                )
                want = {
                    int(r.id): (None if pd.isna(r.v) else int(r.v))
                    for r in ref.itertuples()
                }
                assert got == want, (trial, direction, tol)
