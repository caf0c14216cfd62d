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


def test_xcorr_matches_numpy_moments(spark, tmp_path):
    """Cross-covariance numerators vs numpy on two crafted hourly
    series (click=[2,0,1], error=[1,3,0] over the shared spine)."""
    np = pytest.importorskip("numpy")
    rows = (
        [(0 * 3600 + i, 1, "click", 1) for i in range(2)]
        + [(2 * 3600 + 5, 1, "click", 1)]
        + [(0 * 3600 + 9, 2, "error", 1)]
        + [(1 * 3600 + i, 2, "error", 1) for i in range(3)]
    )
    d = _events_dir(spark, tmp_path, rows)
    x = np.array([2, 0, 1], dtype=np.int64)   # click counts by hour
    y = np.array([1, 3, 0], dtype=np.int64)   # error counts by hour
    got = {
        r["lag"]: (r["n_pairs"], r["cov_num"], r["var_x"], r["var_y"])
        for r in dc.q_xcorr_types(spark, d).collect()
    }
    for lag in (-2, -1, 0, 1, 2):
        # pair (x_t, y_{t+lag}) for t where both indices are in range
        ts = [t for t in range(3) if 0 <= t + lag < 3]
        xv = np.array([x[t] for t in ts], dtype=np.int64)
        yv = np.array([y[t + lag] for t in ts], dtype=np.int64)
        n = len(ts)
        cov = n * int((xv * yv).sum()) - int(xv.sum()) * int(yv.sum())
        vx = n * int((xv * xv).sum()) - int(xv.sum()) ** 2
        vy = n * int((yv * yv).sum()) - int(yv.sum()) ** 2
        assert got[lag] == (n, cov, vx, vy), lag


def test_sax_quartile_symbols(spark, tmp_path):
    """8 daily segments with strictly increasing PAA means must get
    symbols 1,1,2,2,3,3,4,4 in PAA order (rank-based ntile)."""
    rows = []
    for day in range(8):
        # day d gets d+1 events in its first hour -> paa floor((d+1)/24)
        # would collapse; instead spread d+1 events over EVERY hour of
        # the day so paa == d+1 exactly
        for h in range(24):
            for i in range(day + 1):
                rows.append((day * 86400 + h * 3600 + i, 1, "view", 1))
    d = _events_dir(spark, tmp_path, rows)
    base = (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).days
    got = {
        r["segment"] - base: (r["paa"], r["symbol"])
        for r in dc.q_sax_paa(spark, d).collect()
        if r["source"] == "view"
    }
    want = {seg: (seg + 1, seg // 2 + 1) for seg in range(8)}
    assert got == want


def test_decay_topk_weights_and_ties(spark, tmp_path):
    """u1: 1 event on the reference day (w=2^30); u2: 2 events one day
    earlier (w=2*2^29=2^30) — equal scores, tie broken by user_id."""
    rows = [
        (1 * 86400 + 10, 1, "view", 1),
        (0 * 86400 + 10, 2, "view", 1),
        (0 * 86400 + 20, 2, "view", 1),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = [
        (r["rn"], r["user_id"], r["decayed"])
        for r in dc.q_decay_topk(spark, d).collect()
        if r["source"] == "view"
    ]
    assert sorted(got) == [(1, 1, 1 << 30), (2, 2, 1 << 30)]


def test_source_overlap_hand_counts(spark, tmp_path):
    """Two docs (sources src0/src1) sharing exactly one 3-gram."""
    texts = [
        "a b c x y z",      # doc 0 -> src0: shingles {abc,bcx,cxy,xyz}
        "a b c p q r",      # doc 1 -> src1: shingles {abc,bcp,cpq,pqr}
    ]
    d = _docs_dir(spark, tmp_path, texts)
    rows = dc.q_source_overlap(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("src0", "src1")
    assert (r["shared"], r["total_a"], r["total_b"]) == (1, 4, 4)
    # jaccard = 1/7 -> 142 permille (floored)
    assert r["jaccard_permille"] == 142


def test_cohort_retention_hand_triangle(spark, tmp_path):
    """u1 qualifies in weeks 0 and 2; u2 first qualifies in week 1 —
    the triangle must be {(w0,0):1, (w0,2):1, (w1,0):1}."""
    wk = 7 * 24 * 3600
    rows = [
        (0 * wk + 50, 1, "purchase", 100.0),
        (2 * wk + 50, 1, "purchase", 100.0),
        (1 * wk + 50, 2, "purchase", 100.0),
        (1 * wk + 60, 2, "purchase", 1.0),   # below the value floor
        (0 * wk + 70, 3, "view", 100.0),     # wrong type
    ]
    d = _events_dir(spark, tmp_path, rows)
    base = (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).days // 7
    got = {
        (r["cohort_week"] - base, r["week_offset"]): r["n_users"]
        for r in dc.q_cohort_retention(spark, d).collect()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_logbucket_quantile_error_bound(spark, tmp_path):
    """Each estimate is its bucket's lower bound and the true quantile
    lies in the same bucket, so est <= true < est * 1.25 (the 2-bit
    sub-bucket relative-error guarantee, msb >= 2)."""
    import math

    vals = [0.07 * i * i + 0.5 for i in range(1, 120)]  # spread decades
    rows = [(i, 1, "view", v) for i, v in enumerate(vals)]
    d = _events_dir(spark, tmp_path, rows)
    centi = sorted(int(math.floor(v * 100)) + 1 for v in vals)
    got = {
        r["q"]: r["est_centi"]
        for r in dc.q_logbucket_quantile(spark, d).collect()
        if r["source"] == "view"
    }
    for q in (500, 900, 990):
        rank = (q * len(centi) + 999) // 1000
        true = centi[rank - 1]
        est = got[q]
        assert est <= true, (q, est, true)
        assert true < est * 1.25 + 1, (q, est, true)


def test_sax_motifs_words_over_known_symbols(spark, tmp_path):
    """Over the strictly-increasing 8-segment series (symbols
    1,1,2,2,3,3,4,4 in segment order) the 3-day words must be exactly
    112,122,223,233,334,344 — one each."""
    rows = []
    for day in range(8):
        for h in range(24):
            for i in range(day + 1):
                rows.append((day * 86400 + h * 3600 + i, 1, "view", 1))
    d = _events_dir(spark, tmp_path, rows)
    got = {
        r["motif"]: r["n"]
        for r in dc.q_sax_motifs(spark, d).collect()
        if r["source"] == "view"
    }
    assert got == {
        "112": 1, "122": 1, "223": 1, "233": 1, "334": 1, "344": 1
    }


@pytest.mark.parametrize("seed", [7, 99, 1234])
def test_interarrival_random_equals_full_sort_diff(spark, tmp_path, seed):
    """Randomized (seeded) differential: the day-stitched deltas must
    equal a literal pandas full-sort diff for arbitrary event layouts,
    including multi-day gaps and duplicate timestamps."""
    import random

    rng = random.Random(seed)
    rows = []
    for _ in range(300):
        s = rng.randrange(0, 5 * 86400)       # five days incl. gaps
        u = rng.randrange(1, 6)
        t = rng.choice(["view", "click"])
        rows.append((s, u, t, 1))
    rows.append((rows[0][0], 9, rows[0][2], 1))  # duplicate timestamp
    d = _events_dir(spark, tmp_path, rows)

    # literal reference: per type, sort by (us, event_id), diff
    ref: dict[str, list[int]] = {}
    for eid, (s, u, t, v) in enumerate(rows):
        ref.setdefault(t, []).append((s * 1_000_000, eid))
    want = {}
    for t, evs in ref.items():
        evs.sort()
        deltas = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        if deltas:
            want[t] = (
                len(deltas),
                min(deltas),
                max(deltas),
                sum(deltas) // len(deltas),
            )
    got = {
        r["source"]: (r["n_deltas"], r["min_delta_us"],
                      r["max_delta_us"], r["avg_delta_us"])
        for r in dc.q_interarrival(spark, d).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [3, 42])
def test_pagerank_random_equals_literal(spark, tmp_path, seed):
    """Randomized (seeded) differential: ranks over a random event
    stream must equal the literal integer power iteration on the
    day-bounded follows-in-stream edge list."""
    import random

    rng = random.Random(seed)
    rows = [
        (rng.randrange(0, 2 * 86400), rng.randrange(1, 9),
         rng.choice(["view", "click"]), 1)
        for _ in range(200)
    ]
    d = _events_dir(spark, tmp_path, rows)

    streams: dict[tuple, list[tuple]] = {}
    for eid, (s, u, t, v) in enumerate(rows):
        streams.setdefault((t, s // 86400), []).append(
            (s * 1_000_000, eid, u)
        )
    edges = []
    for evs in streams.values():
        evs.sort()
        edges += [(a[2], b[2]) for a, b in zip(evs, evs[1:])]
    want = _pagerank_ref(
        edges, dc.PR_ITERS, dc.PR_SCALE, dc.PR_DAMP_NUM, dc.PR_DAMP_DEN
    )
    got = {
        r["user_id"]: r["rank_fp"]
        for r in dc.q_pagerank(spark, d).collect()
    }
    assert got == want


def test_source_overlap_routes_to_kmv_past_source_bound(spark, tmp_path):
    """VERDICT r04 #4: >SOURCE_OVERLAP_MAX sources must return KMV
    ESTIMATES, not the r04 runtime raise.  80 sources (one doc each)
    share a 40-word body plus 10 unique words — the shared shingles hit
    all 80 sources, far past the in-row collect_set bound of 64."""
    n_src = dc.SOURCE_OVERLAP_MAX + 16
    body = " ".join(f"c{i}" for i in range(40))
    data = [
        (
            g,
            f"{body} " + " ".join(f"u{g}x{j}" for j in range(10)),
            "en",
            f"s{g:03d}",
            100,
        )
        for g in range(n_src)
    ]
    df = spark.createDataFrame(
        data, "doc_id long, text string, lang string, "
        "source string, n_chars long"
    )
    d = str(tmp_path / "fx80")
    df.coalesce(2).write.parquet(d + "/documents.parquet")
    rows = dc.q_source_overlap(spark, d).collect()
    # every pair shares the body -> full C(n,2) estimate matrix
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r["shared"] >= 1
        assert 0 < r["jaccard_permille"] <= 1000
        # ~38 shared body shingles of ~48-58 total per source
        assert 20 <= r["total_a"] <= 120


def test_markov_stitches_cross_day_transitions(spark, tmp_path):
    """r05 (ADVICE r04 #4): the (user, day)-bounded lag must still see
    transitions across midnight — u1's last day-0 event (view at
    23:59:50) chains into its first day-1 event (click at 00:00:05),
    and a user with a lone event per day yields ONLY stitched edges."""
    rows = [
        (86390, 1, "view", 1),    # day 0 23:59:50
        (86405, 1, "click", 1),   # day 1 00:00:05 (stitched edge)
        (86500, 1, "view", 1),    # day 1 in-day edge
        (10, 2, "error", 1),      # day 0 lone
        (86410, 2, "purchase", 1),  # day 1 lone (stitched edge)
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in dc.q_markov_transitions(spark, d).collect()
    }
    assert got == {
        ("view", "click"): 1,
        ("click", "view"): 1,
        ("error", "purchase"): 1,
    }


# ---------------------------------------------------------------------------
# r05b: alert episodes, source drift, shingle coverage, dod census
# ---------------------------------------------------------------------------

TB0 = 473352  # hour-bucket of T0 (2024-01-01T00:00Z): 1704067200 / 3600


def _hourly_events(hours):
    """(source, hour_index, count) triples -> event rows: `count`
    events inside that hour."""
    rows = []
    for src, h, c in hours:
        for j in range(c):
            rows.append((h * 3600 + j, 1, src, 1))
    return rows


def test_alert_episodes_chains_across_midnight(spark, tmp_path):
    """A hot run spanning hours 22..25 (crossing midnight) must emit
    ONE episode; a below-threshold hour breaks the run; an isolated
    hot hour is its own episode; a 25-hour always-hot stream chains
    transitively through two midnights."""
    hours = (
        [("view", h, 4) for h in (22, 23, 24, 25)]
        + [("view", 27, 3)]          # below ALERT_HOT: not an episode
        + [("view", 29, 5)]          # isolated hot hour
        + [("click", h, 4) for h in range(24, 49)]  # 25h through 2 days
    )
    d = _events_dir(spark, tmp_path, _hourly_events(hours))
    got = {
        (r["source"], r["start_tb"], r["end_tb"],
         r["n_hours"], r["peak_n"], r["total_n"])
        for r in dc.q_alert_episodes(spark, d).collect()
    }
    assert got == {
        ("view", TB0 + 22, TB0 + 25, 4, 4, 16),
        ("view", TB0 + 29, TB0 + 29, 1, 5, 5),
        ("click", TB0 + 24, TB0 + 48, 25, 4, 100),
    }


@pytest.mark.parametrize("seed", [0, 1])
def test_alert_episodes_random_equals_naive_islands(spark, tmp_path, seed):
    """The day-bounded segments + boundary chain must equal the naive
    single-pass islands on random hot/cold hour patterns."""
    import random

    rng = random.Random(seed)
    hours = []
    for src in ("view", "click"):
        for h in sorted(rng.sample(range(120), 70)):
            hours.append((src, h, rng.randint(1, 8)))
    d = _events_dir(spark, tmp_path, _hourly_events(hours))

    # literal reference: group consecutive hot hours per source
    want = set()
    for src in ("view", "click"):
        hot = sorted(
            (h, c) for s, h, c in hours if s == src and c >= dc.ALERT_HOT
        )
        run = []
        for h, c in hot + [(None, None)]:
            if run and (h is None or h != run[-1][0] + 1):
                want.add((
                    src, TB0 + run[0][0], TB0 + run[-1][0], len(run),
                    max(c2 for _, c2 in run), sum(c2 for _, c2 in run),
                ))
                run = []
            if h is not None:
                run.append((h, c))
    got = {
        (r["source"], r["start_tb"], r["end_tb"],
         r["n_hours"], r["peak_n"], r["total_n"])
        for r in dc.q_alert_episodes(spark, d).collect()
    }
    assert got == want


def _src_docs_dir(spark, tmp_path, docs):
    """(source, text) pairs -> documents.parquet fixture."""
    data = [
        (i, t, "en", s, len(t)) for i, (s, t) in enumerate(docs)
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


def test_source_drift_matches_literal_l1(spark, tmp_path):
    """The in-row pair decomposition S_a + S_b - 2*sum(min) must equal
    the literal fixed-point L1 computed over the FULL union vocabulary
    (one-sided words included), and a disjoint-vocab pair must score
    exactly 1000 permille."""
    FP = 1 << dc.DRIFT_FP_BITS
    d = _src_docs_dir(spark, tmp_path, [
        ("src0", "a a b"),
        ("src1", "a b b b"),
        ("src2", "x x"),
    ])
    dist = {
        "src0": {"a": (2 * FP) // 3, "b": FP // 3},
        "src1": {"a": FP // 4, "b": (3 * FP) // 4},
        "src2": {"x": (2 * FP) // 2},
    }

    def l1(a, b):
        words = set(dist[a]) | set(dist[b])
        return sum(
            abs(dist[a].get(w, 0) - dist[b].get(w, 0)) for w in words
        )

    got = {
        (r["source_a"], r["source_b"]):
            (r["shared_words"], r["l1_fp"], r["drift_permille"])
        for r in dc.q_source_drift(spark, d).collect()
    }
    s = {k: sum(v.values()) for k, v in dist.items()}
    want = {
        ("src0", "src1"): (2, l1("src0", "src1"),
                           l1("src0", "src1") * 1000
                           // (s["src0"] + s["src1"])),
        ("src0", "src2"): (0, l1("src0", "src2"), 1000),
        ("src1", "src2"): (0, l1("src1", "src2"), 1000),
    }
    assert got == want


def test_vocab_coverage_counts_first_occurrences(spark, tmp_path):
    """10 docs -> one decile each; doc 7 repeats doc 2's text so decile
    7 contributes nothing (no row) and the cumulative curve skips it."""
    texts = [f"a{i} b{i} c{i}" for i in range(10)]
    texts[7] = texts[2]
    d = _docs_dir(spark, tmp_path, texts)
    rows = {
        r["decile"]: (r["new_words"], r["cum_words"])
        for r in dc.q_vocab_coverage(spark, d).collect()
    }
    want = {}
    cum = 0
    for dec in range(10):
        if dec == 7:
            continue
        cum += 1
        want[dec] = (1, cum)
    assert rows == want


def test_dod_compressibility_hand_census(spark, tmp_path):
    """Two Gorilla blocks (days) with hand-placed counts hitting every
    bit class: day 0 [5,5,5,6,8,2500] -> header + 2x c1 + 2x c9 + c36;
    day 1 [5,105,405,2405] -> header + 2x c12 + c16."""
    hours = (
        [("view", h, c) for h, c in
         zip((0, 1, 2, 3, 4, 5), (5, 5, 5, 6, 8, 2500))]
        + [("view", 24 + h, c) for h, c in
           zip((0, 1, 2, 3), (5, 105, 405, 2405))]
    )
    d = _events_dir(spark, tmp_path, _hourly_events(hours))
    rows = dc.q_dod_compressibility(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["blocks"], r["points"]) == (2, 10)
    assert (r["c1"], r["c9"], r["c12"], r["c16"], r["c36"]) == (
        2, 2, 2, 1, 1,
    )
    # day 0: 64+1+1+9+9+36 = 120; day 1: 64+12+12+16 = 104
    assert r["bits_total"] == 224
    assert r["bpp_milli"] == 224 * 1000 // 10


# ---------------------------------------------------------------------------
# r05c: retention sweeper, late-arrival census, journey paths, MG heavy
# hitters
# ---------------------------------------------------------------------------

DAY0 = 19723  # day-bucket of T0 (2024-01-01): 1704067200 / 86400


def test_retention_policy_actions_and_reclaim(spark, tmp_path):
    """Hand-aged partitions: day 25 (age 0) keeps raw, day 10 (age 15)
    downsamples to its distinct hours, day 0 (age 25) keeps one daily
    row."""
    day = 86400
    rows = (
        # day 0: 2 events in 2 distinct hours
        [(0, 1, "view", 1), (3600, 1, "view", 1)]
        # day 10: 4 events in 1 hour
        + [(10 * day + j, 1, "view", 1) for j in range(4)]
        # day 25: 3 events in 2 distinct hours
        + [(25 * day, 1, "view", 1), (25 * day + 1, 1, "view", 1),
           (25 * day + 3600, 1, "view", 1)]
    )
    d = _events_dir(spark, tmp_path, rows)
    got = {
        r["day"]: (r["age_days"], r["action"], r["n_raw"],
                   r["rows_kept"], r["rows_reclaimed"])
        for r in dc.q_retention_policy(spark, d).collect()
    }
    assert got == {
        DAY0 + 25: (0, "keep_raw", 3, 3, 0),
        DAY0 + 10: (15, "hourly", 4, 1, 3),
        DAY0: (25, "daily", 2, 1, 1),
    }


def test_late_arrival_census_hand(spark, tmp_path):
    """Ingest order (= event_id order) with two hand-placed regressions:
    id2 arrives 50s behind the running max, id4 250s behind."""
    rows = [
        (100, 1, "a", 1),  # id0: watermark 100
        (200, 1, "a", 1),  # id1: watermark 200
        (150, 1, "a", 1),  # id2: 50s late
        (300, 1, "b", 1),  # id3: watermark 300
        (50, 1, "b", 1),   # id4: 250s late
        (300, 1, "b", 1),  # id5: ties the watermark -> not late
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {
        r["source"]: (r["n_events"], r["n_late"], r["max_late_us"],
                      r["late_permille"])
        for r in dc.q_late_arrival(spark, d).collect()
    }
    assert got == {
        "a": (3, 1, 50_000_000, 333),
        "b": (3, 1, 250_000_000, 333),
    }


def test_journey_paths_ties_and_threshold(spark, tmp_path):
    """One user walks view>click>purchase on five separate days (the
    view and click share a SECOND — event_id must break the tie); a
    below-threshold journey on a sixth day stays out."""
    day = 86400
    rows = []
    for k in range(5):
        # same second for the first two: list order = event_id order
        rows.append((k * day + 100, 7, "view", 1))
        rows.append((k * day + 100, 7, "click", 1))
        rows.append((k * day + 200, 7, "purchase", 1))
    # one lone error>view>click day: count 1 < PATH_MIN_COUNT
    rows += [(30 * day, 7, "error", 1), (30 * day + 1, 7, "view", 1),
             (30 * day + 2, 7, "click", 1)]
    d = _events_dir(spark, tmp_path, rows)
    got = {(r["path"], r["n"])
           for r in dc.q_journey_paths(spark, d).collect()}
    assert got == {("view>click>purchase", 5)}


def test_heavy_hitters_mg_differential(spark, tmp_path):
    """Random zipf-ish corpus, adversarially partitioned 16 ways: the
    two-pass MG output must equal the exact definition (every word
    with count * MG_K > n_words, with its exact count)."""
    import collections
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(400)]
    texts = []
    for _ in range(60):
        words = [vocab[min(int(rng.expovariate(0.018)), 399)]
                 for _ in range(rng.randint(20, 80))]
        texts.append(" ".join(words))
    exact = collections.Counter(
        w for t in texts for w in t.split()
    )
    n = sum(exact.values())
    expected = {(w, c, n) for w, c in exact.items()
                if c * dc.MG_K > n}
    assert expected, "fixture must contain at least one heavy hitter"

    data = [(i, t, "en", f"s{i % 3}", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        data, "doc_id long, text string, lang string, "
        "source string, n_chars long"
    ).repartition(16)
    out = str(tmp_path / "fx")
    df.write.mode("overwrite").parquet(out + "/documents.parquet")

    got = {(r["word"], r["n"], r["n_words"])
           for r in dc.q_heavy_hitters_mg(spark, out).collect()}
    assert got == expected


def test_mg_candidates_keeps_guaranteed_survivor():
    """Batched MG bound: a word with partition count > n_p/(CAPACITY+1)
    must survive any decrement schedule.  10 batches of 30x hot + 970
    singleton colds: hot ends >= 300 - 10 decrements."""
    import pandas as pd

    batches = []
    for b in range(10):
        words = ["hot"] * 30 + [f"cold_{b}_{i}" for i in range(970)]
        batches.append(pd.DataFrame({"word": words}))
    outs = list(dc._mg_candidates(iter(batches)))
    cands = set()
    for o in outs:
        cands.update(o["word"])
    assert "hot" in cands
    assert len(cands) <= dc.MG_CAPACITY


def test_slo_ribbon_exact_discrete_quantiles(spark, tmp_path):
    """n=10 evenly spread values: p50 is the 5th smallest (ceil(.5n)),
    p95 the 10th (ceil(9.5)); a tie-heavy day picks the smallest value
    whose cumulative count crosses the bar."""
    rows = [(j, 1, "a", float(10 * (j + 1))) for j in range(10)]
    rows += [(j, 1, "b", v) for j, v in enumerate([1.0, 1.0, 1.0, 3.0])]
    d = _events_dir(spark, tmp_path, rows)
    got = {r["source"]: (r["n"], r["p50_c"], r["p95_c"], r["max_c"])
           for r in dc.q_slo_ribbon(spark, d).collect()}
    assert got == {
        "a": (10, 5000, 10000, 10000),
        "b": (4, 100, 300, 300),
    }


def test_mad_outliers_robust_to_extremes(spark, tmp_path):
    """[10,12,14,16,100]: median 14.00, deviations [400,200,0,200,8600]
    cents -> MAD 200; only the 100 exceeds 5*MAD.  The mean/stddev
    detector would have been dragged toward the outlier; the median
    pair is not."""
    rows = [(j, 1, "a", v)
            for j, v in enumerate([10.0, 12.0, 14.0, 16.0, 100.0])]
    d = _events_dir(spark, tmp_path, rows)
    rows_out = dc.q_mad_outliers(spark, d).collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert (r["n"], r["med_c"], r["mad_c"], r["n_outliers"]) == (
        5, 1400, 200, 1,
    )


def test_triangle_counts_hand_graph(spark, tmp_path):
    """Stream order 1,2,3,1,3,4 (one stream, one day) builds edges
    {1-2, 2-3, 1-3, 3-4} (the duplicate 1-3 dedupes, direction
    normalizes): exactly one triangle (1,2,3); user 4 participates in
    none and must not appear."""
    rows = [(j * 10, u, "view", 1) for j, u in enumerate([1, 2, 3, 1, 3, 4])]
    d = _events_dir(spark, tmp_path, rows)
    got = {(r["user_id"], r["n_triangles"])
           for r in dc.q_triangle_counts(spark, d).collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_triangle_counts_hub_kept_out_of_wedges(spark, tmp_path):
    """A hub star (user 9 linked to 20 leaves, no leaf-leaf edges) has
    zero triangles: the degree orientation points every edge INTO the
    hub, so the hub contributes no wedges at all (the scale property);
    adding one leaf-leaf edge creates exactly one triangle."""
    # star: 9,1,9,2,9,3,... consecutive pairs give (9,k) edges
    seq = []
    for k in range(1, 21):
        seq += [9, k]
    rows = [(j * 10, u, "view", 1) for j, u in enumerate(seq)]
    # leaf-leaf edges via the walk's tail: ...,9,20,1,2 adds (20,1)
    # and (1,2) -> triangles (9,1,2) and (9,1,20)
    n0 = len(rows)
    rows += [(n0 * 10, 1, "view", 1), (n0 * 10 + 10, 2, "view", 1)]
    d = _events_dir(spark, tmp_path, rows)
    got = {(r["user_id"], r["n_triangles"])
           for r in dc.q_triangle_counts(spark, d).collect()}
    assert got == {(9, 2), (1, 2), (2, 1), (20, 1)}


def test_inverted_index_postings_capped_and_exact(spark, tmp_path):
    """'a' appears in 10 docs (df 10, postings capped at 8), 'b' in 3
    with varying tf, 'c' in 2 (below IDX_MIN_DF -> absent)."""
    texts = []
    for i in range(10):
        t = "a"
        if i < 3:
            t += " b" * (i + 1)  # tf(b) = 1, 2, 3 in docs 0, 1, 2
        if i in (4, 7):
            t += " c"
        texts.append(t)
    d = _docs_dir(spark, tmp_path, texts)
    got = {r["term"]: (r["df"], r["tf_total"], r["postings"])
           for r in dc.q_inverted_index(spark, d).collect()}
    assert got == {
        "a": (10, 10, "0:1,1:1,2:1,3:1,4:1,5:1,6:1,7:1"),
        "b": (3, 6, "0:1,1:2,2:3"),
    }


def test_state_durations_clip_at_midnight(spark, tmp_path):
    """One user: 'view' at 23:00 day 0, 'click' at 01:00 day 1, last
    event at 02:00 day 1.  The view interval (2h) must split 1h/1h
    across the midnight; the click interval (1h) lands whole on day 1;
    the final event opens no interval."""
    day = 86400
    rows = [
        (23 * 3600, 1, "view", 1),
        (day + 1 * 3600, 1, "click", 1),
        (day + 2 * 3600, 1, "error", 1),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {(r["state"], r["day"]): (r["n_intervals"], r["total_us"])
           for r in dc.q_state_durations(spark, d).collect()}
    us = 1_000_000
    assert got == {
        ("view", DAY0): (1, 3600 * us),
        ("view", DAY0 + 1): (1, 3600 * us),
        ("click", DAY0 + 1): (1, 3600 * us),
    }


def test_slo_weekly_merges_day_histograms(spark, tmp_path):
    """Values spread across two days of the same week must quantile as
    ONE merged weekly population; a second week stays separate.
    DAY0 = 19723 -> week 2817 covers days 19719..19725, so day offsets
    0..2 are week 2817 and offsets 3+ land in week 2818."""
    day = 86400
    rows = (
        [(j, 1, "a", float(10 * (j + 1))) for j in range(5)]       # day 0
        + [(day + j, 1, "a", float(10 * (j + 6))) for j in range(5)]  # day 1
        + [(3 * day + j, 1, "a", 7.0) for j in range(4)]           # next wk
    )
    d = _events_dir(spark, tmp_path, rows)
    got = {r["week"]: (r["n"], r["p50_c"], r["p95_c"], r["max_c"])
           for r in dc.q_slo_weekly(spark, d).collect()}
    # merged week: values 10..100 cents*100 -> p50 = 5th smallest 5000
    assert got == {
        2817: (10, 5000, 10000, 10000),
        2818: (4, 700, 700, 700),
    }


def test_containment_subset_doc_detected(spark, tmp_path):
    """A short doc fully embedded in a long one: Jaccard is tiny (the
    union is dominated by the long doc) but containment must be 1000
    with the short doc as doc_sub."""
    short = "a b c d e"                      # shingles {abc,bcd,cde}
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    other = "p q r s t u"                    # no overlap
    d = _docs_dir(spark, tmp_path, [short, long_, other])
    rows = dc.q_containment(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_sub"], r["doc_super"]) == (0, 1)
    assert (r["n_sub"], r["inter"], r["cont_permille"]) == (3, 3, 1000)
    # the same pair must be BELOW q_ngram_jaccard's 50% bar — the
    # whole point of the asymmetric score
    jac = dc.q_ngram_jaccard(spark, d).collect()
    assert jac == []


def test_bpe_merge_step_hand_counts(spark, tmp_path):
    """Corpus 'ab ab abc': pair 'ab' appears once per word occurrence
    (weighted by word frequency 2+1), 'bc' once; 1-char words are
    skipped by the length guard."""
    d = _docs_dir(spark, tmp_path, ["ab ab abc", "x"])
    got = {r["pair"]: r["wcount"]
           for r in dc.q_bpe_merge_step(spark, d).collect()}
    assert got == {"ab": 3, "bc": 1}


def test_lsh_band_stats_identical_docs_collide_everywhere(spark, tmp_path):
    """Two identical docs share every signature, so all 4 bands show
    one colliding bucket of size 2 (= 1 candidate pair each); a third
    unrelated doc must not inflate any bucket."""
    d = _docs_dir(spark, tmp_path, [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta epsilon",
        "totally different words here now",
    ])
    got = {r["band_idx"]: (r["n_buckets"], r["n_cand_pairs"], r["max_bucket"])
           for r in dc.q_lsh_band_stats(spark, d).collect()}
    assert got == {bi: (1, 1, 2) for bi in range(4)}
    # census must agree with the materialized candidate pairs
    pairs = dc.q_minhash_pairs(spark, d).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(0, 1)]
