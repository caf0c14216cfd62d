"""Connected components over a near-dup candidate graph — the step a
training-data pipeline runs after MinHash/LSH pair generation: candidate
pairs -> duplicate CLUSTERS -> one survivor per cluster.

Algorithm: hash-min label propagation (the standard Spark CC shape,
same propagation rule GraphFrames/GraphX use): every node starts
labeled with itself; each round every node takes the min label among
itself and its neighbors; converged when no label changes.  Rounds =
O(component diameter) — near-dup clusters are dense and shallow, so
this is 2-4 rounds in practice.  Each round is one shuffle join + one
shuffle aggregate on the edge key; labels are persisted and the plan is
cut per round (iterative lineage would otherwise grow unboundedly).

At 10^9 edges the round cost is bounded by the edge-join shuffle; the
classic large-star/small-star optimization halves rounds on adversarial
long-path graphs, which near-dup graphs are not — documented tradeoff.

WHEN TO UPGRADE: hash-min converges in exactly diameter(G) rounds
(pinned by test_clusters.py's path-graph case), so the default
max_iter=25 is a diameter budget.  Near-dup graphs are dense and
shallow (diameter 2-4 observed at sf0.1); a component with diameter
> 25 — a chain of pairwise-similar documents, each neighbor pair just
over the threshold — exhausts the budget and RAISES (below) rather
than silently returning partial labels.  At that point switch to
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14), which contracts in O(log^2 n) rounds
on any graph shape at ~2x the per-round shuffle cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Label propagation exhausted max_iter without converging."""


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """edges: (a, b) undirected pairs; nodes: (node) — every vertex,
    including singletons.  Returns (node, label) with label = min node
    id in the component.

    Raises ``ConvergenceError`` if max_iter rounds pass without the
    sum(label) witness stabilizing (strict=False downgrades to a WARN
    log and returns the partial labels): the DuckDB recursive-CTE
    oracle always converges, so silently-unconverged labels would
    surface as an undiagnosable hash mismatch at the driver gate."""
    sym = edges.selectExpr("a AS src", "b AS dst").unionByName(
        edges.selectExpr("b AS src", "a AS dst")
    )
    sym = sym.repartition("src").persist()
    sym.count()

    # localCheckpoint (not just persist): each round's plan must be CUT,
    # or the iterative lineage grows a tree that eventually OOMs the
    # driver just STRINGIFYING the plan (observed at ~10 rounds on the
    # sf0.1 graph) — the standard Spark iterative-algorithm requirement
    labels = nodes.select(
        F.col("node"), F.col("node").alias("label")
    ).localCheckpoint()
    # labels only ever decrease, so sum(label) is a strictly-decreasing
    # convergence witness: one cheap aggregate per round instead of a
    # changed-rows join
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    converged = False
    for _ in range(max_iter):
        neighbor = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    sym.unpersist()
    if not converged:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"(component diameter exceeds the budget); raise max_iter or "
            f"switch to large-star/small-star for long-chain graphs"
        )
        if strict:
            raise ConvergenceError(msg)
        import logging

        logging.getLogger(__name__).warning(msg)
    return labels
