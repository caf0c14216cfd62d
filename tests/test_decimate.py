"""LTTB decimation vs a literal reference implementation + invariants."""

import numpy as np
from pyspark.sql import functions as F

from tinybrain_spark.decimate import lttb_decimate, lttb_indices


def _lttb_reference(t, v, n_out):
    """Straight transcription of Steinarsson's algorithm (loops, no
    vectorization) — the independent check for the module's version."""
    n = len(t)
    if n_out >= n:
        return list(range(n))
    if n_out <= 2:
        return [0, n - 1] if n_out == 2 else [0]
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    sel = [0]
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo = edges[b + 1]
        nhi = edges[b + 2] if b + 2 < len(edges) else n
        if nhi <= nlo:
            nlo, nhi = n - 1, n
        ct = float(np.mean(t[nlo:nhi]))
        cv = float(np.mean(v[nlo:nhi]))
        pa_t, pa_v = float(t[sel[-1]]), float(v[sel[-1]])
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs(
                (float(t[i]) - pa_t) * (cv - pa_v)
                - (ct - pa_t) * (float(v[i]) - pa_v)
            )
            if area > best_area:
                best, best_area = i, area
        sel.append(best)
    sel.append(n - 1)
    return sel


def test_lttb_matches_reference_random_series():
    rng = np.random.default_rng(5)
    for n, n_out in [(100, 10), (57, 12), (500, 50), (10, 10), (10, 3)]:
        t = np.sort(rng.choice(100000, size=n, replace=False)).astype(
            np.int64
        )
        v = rng.integers(0, 10000, size=n).astype(np.int64)
        got = lttb_indices(t, v, n_out).tolist()
        assert got == _lttb_reference(t, v, n_out), (n, n_out)


def test_lttb_keeps_endpoints_and_spikes():
    # flat series with one big spike: the spike must survive
    t = np.arange(200, dtype=np.int64)
    v = np.zeros(200, dtype=np.int64)
    v[137] = 10000
    idx = lttb_indices(t, v, 20)
    assert idx[0] == 0 and idx[-1] == 199
    assert 137 in idx
    assert len(idx) == 20
    assert np.all(np.diff(idx) > 0)  # strictly increasing


def test_lttb_decimate_spark(spark):
    rng = np.random.default_rng(9)
    rows = []
    for key in ("a", "b"):
        t = np.sort(rng.choice(50000, size=300, replace=False))
        v = rng.integers(0, 5000, size=300)
        rows += [(key, int(ti), int(vi)) for ti, vi in zip(t, v)]
    df = spark.createDataFrame(rows, "k string, t long, v long").repartition(5)
    out = lttb_decimate(df, ["k"], "t", "v", 40)
    got = {
        key: [(r["t"], r["v"]) for r in sorted(g, key=lambda r: r["t"])]
        for key, g in __import__("itertools").groupby(
            sorted(out.collect(), key=lambda r: r["k"]), key=lambda r: r["k"]
        )
    }
    by_key = {}
    for k, t, v in rows:
        by_key.setdefault(k, []).append((t, v))
    for key, pts in by_key.items():
        pts.sort()
        t = np.array([p[0] for p in pts], dtype=np.int64)
        v = np.array([p[1] for p in pts], dtype=np.int64)
        idx = _lttb_reference(t, v, 40)
        want = [(int(t[i]), int(v[i])) for i in idx]
        assert got[key] == want, key


def test_ewma_matches_reference_and_is_partition_invariant(spark):
    from tinybrain_spark.decimate import ewma_smooth

    rng = np.random.default_rng(3)
    rows = []
    series = {}
    for key in ("a", "b"):
        t = np.sort(rng.choice(9999, size=120, replace=False))
        v = rng.integers(0, 5000, size=120)
        series[key] = (t, v)
        rows += [(key, int(ti), int(vi)) for ti, vi in zip(t, v)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    for parts in (1, 7):
        out = ewma_smooth(df.repartition(parts), ["k"], "t", "v",
                          alpha_ppt=300)
        got = {(r["k"], r["t"]): r["smoothed"] for r in out.collect()}
        for key, (t, v) in series.items():
            s = v[0]
            assert got[(key, int(t[0]))] == s
            for i in range(1, len(v)):
                s = (300 * int(v[i]) + 700 * s) // 1000
                assert got[(key, int(t[i]))] == s


def test_ewma_many_differential_vs_literal_loop():
    """ewma_many (cross-series vectorized scan, VERDICT r03 #5) must be
    bit-identical to the literal per-element recurrence for ragged
    series mixes, zero-length series, negatives, and every alpha."""
    from tinybrain_spark.decimate import ewma_many, ewma_ref

    rng = np.random.default_rng(11)
    for alpha in (1, 200, 500, 999):
        lengths = np.array(
            [0, 1, 2, 37, 5, 400, 0, 113, 64, 1], dtype=np.int64
        )
        series = [
            rng.integers(-100000, 100000, l).astype(np.int64)
            for l in lengths
        ]
        flat = np.concatenate(series) if series else np.array([], np.int64)
        want = (
            np.concatenate([ewma_ref(v, alpha) for v in series])
            if len(flat)
            else flat
        )
        got = ewma_many(flat, lengths, alpha)
        assert np.array_equal(got, want), alpha


def test_ewma_many_chunked_column_groups():
    """A bucket mixing one long series with many short ones must chunk
    into capped column groups (incl. a width-1 scalar-path group),
    staying bit-exact across the group boundaries."""
    from tinybrain_spark.decimate import ewma_many, ewma_ref

    rng = np.random.default_rng(5)
    lengths = np.array([5000, 3, 900, 900, 7, 1], dtype=np.int64)
    series = [rng.integers(0, 9999, l).astype(np.int64) for l in lengths]
    flat = np.concatenate(series)
    want = np.concatenate([ewma_ref(v, 200) for v in series])
    # cap forces: [5000] alone (scalar path), [900,900] pair, the rest
    got = ewma_many(flat, lengths, 200, cell_cap=2000)
    assert np.array_equal(got, want)
    # and an uncapped run agrees too
    assert np.array_equal(ewma_many(flat, lengths, 200), want)


def test_ewma_bucketed_mode_bit_identical(spark):
    """n_buckets mode (cross-series scan per hash bucket) == per-key
    mode == literal recurrence, at several bucket counts."""
    from tinybrain_spark.decimate import ewma_smooth

    rng = np.random.default_rng(7)
    rows = []
    series = {}
    for ki in range(17):
        key = f"s{ki}"
        n = int(rng.integers(1, 60))
        t = np.sort(rng.choice(99999, size=n, replace=False))
        v = rng.integers(-5000, 5000, size=n)
        series[key] = (t, v)
        rows += [(key, int(ti), int(vi)) for ti, vi in zip(t, v)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    want = {}
    for key, (t, v) in series.items():
        s = int(v[0])
        want[(key, int(t[0]))] = s
        for i in range(1, len(v)):
            s = (200 * int(v[i]) + 800 * s) // 1000
            want[(key, int(t[i]))] = s
    for n_buckets in (1, 3, 64):
        out = ewma_smooth(
            df.repartition(5), ["k"], "t", "v", n_buckets=n_buckets
        )
        got = {(r["k"], r["t"]): r["smoothed"] for r in out.collect()}
        assert got == want, n_buckets


def test_serving_missing_tier_raises_routing_error(spark, tmp_path):
    import pytest

    from tinybrain_spark.rollup import RollupConfig, RollupEngine
    from tinybrain_spark.serving import read_series

    engine = RollupEngine(spark, str(tmp_path / "empty_wh"))
    cfg = RollupConfig(kernel="avg", window=4, num_tiers=2,
                       run_kind="nothing_here")
    with pytest.raises(FileNotFoundError, match="tier 2 .*resolution 16"):
        read_series(engine, cfg, None, 16)


def test_ewma_lone_series_differential_vs_literal_loop():
    """The single-series speculative chunked scan (VERDICT r04 #6) must
    be bit-identical to the literal recurrence for every alpha regime —
    including alpha=0 (no contraction: provisional chunks can never
    converge), alpha=1000 (memoryless), tiny alpha (slow contraction),
    negative values, and lengths straddling the chunk/threshold
    boundaries."""
    import numpy as np

    from tinybrain_spark.decimate import ewma_many, ewma_ref

    rng = np.random.default_rng(11)
    lens = [1, 2, 4095, 4096, 4097, 1024 * 9, 1024 * 9 + 17, 100_000]
    for alpha in (0, 1, 50, 200, 500, 999, 1000):
        for n in lens:
            v = rng.integers(-(10**6), 10**6, size=n, dtype=np.int64)
            want = ewma_ref(v, alpha)
            got = ewma_many(v, np.array([n], dtype=np.int64), alpha)
            assert np.array_equal(got, want), (alpha, n)


def test_ewma_lone_series_speedup_100k():
    """The 1 x 100k-point adversarial bucket must beat the literal
    python loop (the r04 fallback walked Python per point)."""
    import time

    import numpy as np

    from tinybrain_spark.decimate import ewma_many, ewma_ref

    rng = np.random.default_rng(7)
    v = rng.integers(-(10**6), 10**6, size=100_000, dtype=np.int64)
    lengths = np.array([len(v)], dtype=np.int64)
    # warm both paths once (allocator, code paths)
    want = ewma_ref(v, 200)
    assert np.array_equal(ewma_many(v, lengths, 200), want)

    def best_of(f, n=3):
        return min(
            (lambda t0: (f(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(n)
        )

    t_ref = best_of(lambda: ewma_ref(v, 200))
    t_new = best_of(lambda: ewma_many(v, lengths, 200))
    # the bar is deliberately lax (2x) for CI noise; measured ~10x+
    # (BENCH/NOTES.md r05) vs the literal numpy-scalar recurrence
    assert t_new * 2 < t_ref, (t_new, t_ref)
