"""Connected components (hash-min label propagation) unit tests."""

from pyspark.sql import functions as F

from tinybrain_spark.clusters import connected_components


def _cc(spark, edge_list, node_list):
    edges = spark.createDataFrame(edge_list, "a long, b long")
    nodes = spark.createDataFrame([(n,) for n in node_list], "node long")
    out = connected_components(edges, nodes)
    return {r["node"]: r["label"] for r in out.collect()}


def test_components_basic(spark):
    # two components {1,2,3,7} (chain) and {5,6}; 9 is a singleton
    got = _cc(spark, [(2, 1), (2, 3), (3, 7), (5, 6)], [1, 2, 3, 5, 6, 7, 9])
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5, 9: 9}


def test_long_path_converges(spark):
    # worst case for hash-min: a path graph needs diameter rounds
    # (kept small — each round is a real shuffle; near-dup graphs have
    # tiny diameters, see clusters.py docstring)
    n = 8
    got = _cc(spark, [(i, i + 1) for i in range(n - 1)], list(range(n)))
    assert all(v == 0 for v in got.values())


def test_cycle_and_self_edge(spark):
    got = _cc(spark, [(4, 5), (5, 6), (6, 4), (8, 8)], [4, 5, 6, 8])
    assert got == {4: 4, 5: 4, 6: 4, 8: 8}


def test_adversarial_chain_raises_past_budget(spark):
    """A path graph with diameter > max_iter must FAIL LOUDLY (the
    DuckDB recursive-CTE oracle always converges, so a silent partial
    result would surface as an undiagnosable hash mismatch), and the
    same graph must converge with a diameter+1 round budget."""
    import pytest

    from tinybrain_spark.clusters import ConvergenceError

    n = 12  # path 0-1-...-11, diameter 11
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")

    with pytest.raises(ConvergenceError):
        connected_components(edges, nodes, max_iter=4)

    # strict=False: partial labels come back (label 0 has walked exactly
    # max_iter hops down the chain), with a warning instead of a raise
    partial = {
        r["node"]: r["label"]
        for r in connected_components(
            edges, nodes, max_iter=4, strict=False
        ).collect()
    }
    assert partial[4] == 0 and partial[11] > 0

    # hash-min needs diameter rounds of change + 1 confirming round
    full = {
        r["node"]: r["label"]
        for r in connected_components(edges, nodes, max_iter=n).collect()
    }
    assert all(v == 0 for v in full.values())


def _star(spark, edge_list, node_list, **kw):
    from tinybrain_spark.clusters import connected_components_star

    edges = spark.createDataFrame(edge_list, "a long, b long")
    nodes = spark.createDataFrame([(n,) for n in node_list], "node long")
    out = connected_components_star(edges, nodes, **kw)
    return {r["node"]: r["label"] for r in out.collect()}


def test_star_matches_hashmin_on_mixed_graph(spark):
    edges = [(2, 1), (2, 3), (3, 7), (5, 6), (4, 5), (8, 8), (10, 11)]
    nodes = list(range(1, 13))
    assert _star(spark, edges, nodes) == _cc(spark, edges, nodes)


def test_star_long_chain_logarithmic_rounds(spark):
    """A 64-node path (diameter 63) must converge within a LOG round
    budget — the case that exhausts hash-min's diameter budget."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _star(spark, edges, list(range(n)), max_iter=14)
    assert all(v == 0 for v in got.values())


def test_star_singletons_and_dense(spark):
    # clique 0-4 + singleton 9 + pair (7,8)
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)] + [(7, 8)]
    got = _star(spark, edges, [0, 1, 2, 3, 4, 7, 8, 9])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 7: 7, 8: 7, 9: 9}


def test_star_scale_chain_plus_blobs_100k_edges(spark):
    """VERDICT r04 #8: star-CC on an sf1-sized ADVERSARIAL graph —
    a 60k-node chain (diameter 60k: the hash-min killer) + 50 dense
    30-cliques + random bridge noise, ~103k edges total.  Pins (a) the
    labels against a python union-find oracle over the same edges and
    (b) the O(log^2 n) round budget that makes the diameter claim real
    at scale.  Round count + wall recorded in BENCH/NOTES.md."""
    import time

    from tinybrain_spark.clusters import connected_components_star

    rng = __import__("random").Random(5)
    n_chain = 60_000
    edges = [(i, i + 1) for i in range(n_chain - 1)]
    nid = n_chain
    for _ in range(50):  # 50 cliques of 30 => 21,750 edges
        members = list(range(nid, nid + 30))
        nid += 30
        edges += [
            (a, b) for i, a in enumerate(members) for b in members[i + 1:]
        ]
    # noise: 20k random edges inside the blob id range (never touching
    # the chain, so the chain stays the full-diameter component)
    lo, hi = n_chain, nid - 1
    edges += [
        (rng.randint(lo, hi), rng.randint(lo, hi)) for _ in range(20_000)
    ]
    n_nodes = nid
    assert len(edges) >= 100_000

    # python union-find oracle
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in range(n_nodes)}
    # normalize to min-id labels
    comp_min = {}
    for x, r in want.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[r] for x, r in want.items()}

    e_df = spark.createDataFrame(edges, "a long, b long").repartition(8)
    n_df = spark.range(n_nodes).withColumnRenamed("id", "node")
    stats = {}
    t0 = time.time()
    out = connected_components_star(e_df, n_df, max_iter=24, stats=stats)
    got = {r["node"]: r["label"] for r in out.collect()}
    wall = time.time() - t0
    assert got == want
    # log^2 budget: a 60k-diameter chain must land well under 20 rounds
    assert stats["rounds"] <= 20, stats
    print(
        f"\n[star-scale] {len(edges)} edges, {n_nodes} nodes: "
        f"{stats['rounds']} rounds, {wall:.1f}s"
    )
