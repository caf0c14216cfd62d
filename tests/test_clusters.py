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
