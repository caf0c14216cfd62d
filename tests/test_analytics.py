"""Hand-computed / literal-reference differential tests for the r04e/f
analytics operators.

The driver oracle proves Spark == DuckDB on the SAME SQL formulation;
these tests close the remaining gap — that the formulation itself could
be consistently wrong on both engines — by checking the operators
against tiny fixtures whose answers are computed by hand or by a
literal sequential reference implementation (the naive_ref.py pattern).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tinybrain_spark import driver_contract as dc

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events_dir(spark, tmp_path, rows):
    """Write an events.parquet shaped like the driver fixture from
    (seconds_offset, user_id, event_type, value) tuples."""
    data = [
        (i, T0 + dt.timedelta(seconds=s), int(u), t, float(v), "{}")
        for i, (s, u, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    out = str(tmp_path / "fx")
    df.coalesce(1).write.mode("overwrite").parquet(out + "/events.parquet")
    return out


def _docs_dir(spark, tmp_path, texts):
    data = [
        (i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        data, "doc_id long, text string, lang string, "
        "source string, n_chars long"
    )
    out = str(tmp_path / "fx")
    df.coalesce(1).write.mode("overwrite").parquet(
        out + "/documents.parquet"
    )
    return out


def test_funnel_strict_order_semantics(spark, tmp_path):
    """u1 completes in order; u2's only click precedes its view; u3
    never purchases — counts must be 3 / 2 / 1."""
    rows = [
        (10, 1, "view", 1), (20, 1, "click", 1), (30, 1, "purchase", 1),
        (10, 2, "click", 1), (20, 2, "view", 1), (30, 2, "purchase", 1),
        (10, 3, "view", 1), (20, 3, "click", 1),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {
        r["step_name"]: r["n_users"]
        for r in dc.q_funnel_steps(spark, d).collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}


def _pagerank_ref(edges, iters, scale, damp_num, damp_den):
    """Literal integer power iteration (dict-of-lists reference)."""
    nodes = sorted({u for e in edges for u in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {u: scale for u in nodes}
    teleport = (15 * scale) // 100
    for _ in range(iters):
        cin = {u: 0 for u in nodes}
        for s, t in edges:
            cin[t] += r[s] // deg[s]
        r = {u: teleport + damp_num * cin[u] // damp_den for u in nodes}
    return r


def test_pagerank_matches_literal_power_iteration(spark, tmp_path):
    """Stream order A,B,A,C,B within one (type, day) yields edges
    A->B, B->A, A->C, C->B; ranks must equal the literal loop."""
    rows = [
        (10, 1, "click", 1), (20, 2, "click", 1), (30, 1, "click", 1),
        (40, 3, "click", 1), (50, 2, "click", 1),
    ]
    d = _events_dir(spark, tmp_path, rows)
    edges = [(1, 2), (2, 1), (1, 3), (3, 2)]
    want = _pagerank_ref(
        edges, dc.PR_ITERS, dc.PR_SCALE, dc.PR_DAMP_NUM, dc.PR_DAMP_DEN
    )
    got = {
        r["user_id"]: r["rank_fp"]
        for r in dc.q_pagerank(spark, d).collect()
    }
    assert got == want


def test_dup_islands_merges_adjacent_windows(spark, tmp_path):
    """Two docs share a 9-word run => two flagged 8-word windows at
    consecutive positions => ONE island of span_words = 9 per doc."""
    shared = "a b c d e f g h i"  # 9 shared words -> windows at 2 poss
    texts = [
        f"x1 y1 {shared} z1 w1 q1",
        f"x2 y2 u2 {shared} z2 w2",
    ]
    d = _docs_dir(spark, tmp_path, texts)
    rows = dc.q_dup_islands(spark, d).collect()
    spans = {(r["doc_id"], r["span_start"], r["span_words"])
             for r in rows}
    # doc 0: shared run starts at word index 2; doc 1: at index 3
    assert spans == {(0, 2, 9), (1, 3, 9)}


def test_interarrival_stitches_day_boundaries(spark, tmp_path):
    """Deltas across midnight must equal the full-sort diff: events at
    23:59:50, 00:00:10 (+20s across the day boundary) and 00:00:15."""
    rows = [
        (86390, 1, "view", 1),   # 23:59:50 day 0
        (86410, 2, "view", 1),   # 00:00:10 day 1 -> delta 20s
        (86415, 3, "view", 1),   # delta 5s
        (1000, 4, "click", 1),   # other stream: single event, no delta
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {
        r["source"]: (r["n_deltas"], r["min_delta_us"],
                      r["max_delta_us"], r["avg_delta_us"])
        for r in dc.q_interarrival(spark, d).collect()
    }
    assert got == {
        "view": (2, 5_000_000, 20_000_000, 12_500_000)
    }  # click has no deltas -> no row


def test_acf_matches_numpy_moments(spark, tmp_path):
    """cov/var numerators must equal numpy's exact integer moments over
    the zero-filled hourly series."""
    np = pytest.importorskip("numpy")
    # one event type; hourly counts [2, 0, 1, 3] over 4 spine hours
    rows = (
        [(0 * 3600 + i, 1, "view", 1) for i in range(2)]
        + [(2 * 3600 + i, 1, "view", 1) for i in range(1)]
        + [(3 * 3600 + i, 1, "view", 1) for i in range(3)]
    )
    d = _events_dir(spark, tmp_path, rows)
    series = np.array([2, 0, 1, 3], dtype=np.int64)
    got = {
        r["lag"]: (r["n_pairs"], r["cov_num"], r["var_head"],
                   r["var_tail"])
        for r in dc.q_acf_lags(spark, d).collect()
    }
    for k in (1, 2, 3):
        h, t = series[:-k], series[k:]
        n = len(h)
        cov = n * int((h * t).sum()) - int(h.sum()) * int(t.sum())
        vh = n * int((h * h).sum()) - int(h.sum()) ** 2
        vt = n * int((t * t).sum()) - int(t.sum()) ** 2
        assert got[k] == (n, cov, vh, vt), k


def test_markov_counts_and_permille(spark, tmp_path):
    """u1: view->click->view; u2: click->click.  Transition table and
    integer permille must match the hand count."""
    rows = [
        (10, 1, "view", 1), (20, 1, "click", 1), (30, 1, "view", 1),
        (10, 2, "click", 1), (20, 2, "click", 1),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["permille"])
        for r in dc.q_markov_transitions(spark, d).collect()
    }
    assert got == {
        ("view", "click"): (1, 1000),
        ("click", "view"): (1, 500),
        ("click", "click"): (1, 500),
    }
