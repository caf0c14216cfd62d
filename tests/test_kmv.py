"""KMV distinct sketch (tinybrain_spark.kmv).

Pins bit-level agreement with a pure-python replica, the merge law
(sketch of a union == merged sketches), exactness below k, estimator
accuracy at a real compression ratio, and that every n_common member of
a pairwise merge is a true shared element.
"""

import hashlib

from pyspark.sql import functions as F

from tinybrain_spark import kmv as KM

K = 16


def _h(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:8], 16)


def _py_kmv(values, k=K):
    return sorted({_h(v) for v in values})[:k]


def _df(spark, rows):
    """rows: (grp, val)"""
    return spark.createDataFrame(rows, "grp string, v string")


def _sketches(spark, rows, k=K):
    got = KM.build_kmv(_df(spark, rows), ["grp"], "v", k=k).collect()
    return {r["grp"]: list(r["kmin"]) for r in got}


def test_build_matches_python_replica(spark):
    rows = [("a", f"x{i}") for i in range(300)] + [
        ("b", f"y{i}") for i in range(7)
    ]
    got = _sketches(spark, rows)
    assert got["a"] == _py_kmv([f"x{i}" for i in range(300)])
    # below k: the sketch IS the set
    assert got["b"] == _py_kmv([f"y{i}" for i in range(7)])
    assert len(got["b"]) == 7


def test_build_dedups_values(spark):
    rows = [("a", f"x{i % 20}") for i in range(500)]
    got = _sketches(spark, rows)
    assert got["a"] == _py_kmv([f"x{i}" for i in range(20)])


def test_merge_law(spark):
    """merge(kmv(A), kmv(B)) == kmv(A | B) — sketches accrete."""
    a = [f"a{i}" for i in range(200)]
    b = [f"b{i}" for i in range(200)] + a[:50]
    sk = _sketches(spark, [("a", v) for v in a] + [("b", v) for v in b])
    two = spark.createDataFrame(
        [(sk["a"], sk["b"])], "ka array<long>, kb array<long>"
    )
    merged = two.select(
        KM.kmv_merge(F.col("ka"), F.col("kb"), K).alias("m")
    ).collect()[0]["m"]
    assert list(merged) == _py_kmv(set(a) | set(b))


def test_estimate_exact_below_k_and_accurate_above(spark):
    rows = [("small", f"s{i}") for i in range(9)] + [
        ("big", f"b{i}") for i in range(5000)
    ]
    est = {
        r["grp"]: r["est"]
        for r in KM.build_kmv(_df(spark, rows), ["grp"], "v", k=K)
        .select("grp", KM.kmv_estimate(F.col("kmin"), K).alias("est"))
        .collect()
    }
    assert est["small"] == 9
    # k=16 -> relative std error ~ 1/sqrt(k-2) ~ 27%; allow 3 sigma
    assert 1500 < est["big"] < 9000


def test_union_intersect_estimates(spark):
    shared = [f"s{i}" for i in range(400)]
    a = shared + [f"a{i}" for i in range(600)]
    b = shared + [f"b{i}" for i in range(600)]
    k = 64
    sk = _sketches(spark, [("a", v) for v in a] + [("b", v) for v in b], k=k)
    two = spark.createDataFrame(
        [(sk["a"], sk["b"])], "ka array<long>, kb array<long>"
    )
    row = KM.kmv_union_intersect(two, "ka", "kb", k).collect()[0]
    # every n_common member is a REAL shared element
    merged = set(_py_kmv(set(a) | set(b), k))
    both = {h for h in merged if h in set(sk["a"]) and h in set(sk["b"])}
    true_shared = {_h(v) for v in shared}
    assert both <= true_shared
    assert row["n_common"] == len(both)
    # |A u B| = 1600, |A n B| = 400; k=64 -> ~13% rse, allow 3 sigma
    assert 900 < row["union_est"] < 2400
    assert 100 < row["intersect_est"] < 800
    # the estimator identity holds exactly (integer math)
    assert row["intersect_est"] == (row["n_common"] * row["union_est"]) // k


def test_salt_invariance(spark):
    """The salted two-phase build returns identical sketches for any
    lane count — partials lose nothing."""
    rows = [("a", f"x{i}") for i in range(1000)]
    one = _sketches(spark, rows)
    for s in (1, 4, 64):
        got = {
            r["grp"]: list(r["kmin"])
            for r in KM.build_kmv(
                _df(spark, rows), ["grp"], "v", k=K, salt_buckets=s
            ).collect()
        }
        assert got == one


def test_pairwise_overlap_estimates_100_groups(spark):
    """The >64-group scale path (VERDICT r04 #4): 100 groups sharing a
    common 200-value core plus 30 unique values each.  Every C(100,2)
    pair must get an ESTIMATE (no raise), with totals near 230 and
    Jaccard near 200/260 ≈ 770 permille (loose bands — k=16 here so
    the estimator is coarse; exactness is pinned separately below k)."""
    core = [f"core{i}" for i in range(200)]
    rows = [
        (f"g{g:03d}", v)
        for g in range(100)
        for v in core + [f"u{g}_{j}" for j in range(30)]
    ]
    sk = KM.build_kmv(_df(spark, rows), ["grp"], "v", k=K)
    out = KM.pairwise_overlap(sk, "grp", K).collect()
    assert len(out) == 100 * 99 // 2
    for r in out:
        assert 100 <= r["total_a"] <= 500
        assert 100 <= r["total_b"] <= 500
        assert r["shared"] >= 1
        assert 300 <= r["jaccard_permille"] <= 1000
    # determinism: a rebuilt pipeline yields identical estimates
    again = KM.pairwise_overlap(
        KM.build_kmv(_df(spark, rows), ["grp"], "v", k=K), "grp", K
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pairwise_overlap_disjoint_groups_emit_nothing(spark):
    """Groups with no shared hashes produce no pair row — mirrors the
    exact path emitting only overlapping pairs."""
    rows = [("a", f"x{i}") for i in range(40)] + [
        ("b", f"y{i}") for i in range(40)
    ]
    sk = KM.build_kmv(_df(spark, rows), ["grp"], "v", k=K)
    assert KM.pairwise_overlap(sk, "grp", K).count() == 0
