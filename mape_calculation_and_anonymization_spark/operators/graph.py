"""Distributed connected components — near-duplicate CLUSTERING.

Pair lists (from exact dedup, MinHash/SimHash LSH, or embedding
near-dup) only say "a matches b"; choosing which rows to keep/drop
needs the transitive closure: connected components over the match
graph. Single-node tools union-find in memory; at 100 TB the graph
itself is distributed, so this implements label propagation as an
iterative DataFrame program (the alternating-minimum scheme of
large-star/small-star, Kiveris et al., "Connected Components in
MapReduce and Beyond"):

    label(v) ← min(label(v), min over neighbours' labels)

repeated to fixpoint. Each round is one shuffle (groupBy min over the
symmetrized edge list); convergence needs at most the graph diameter
rounds — near-dup graphs are overwhelmingly tiny star/clique clusters,
so 2-4 rounds in practice. Every round localCheckpoints the label
frame: this TRUNCATES the lineage (no exponential plan growth) and
materializes the loop state, the standard Spark iterative-algorithm
pattern. The driver only ever sees a per-round count of label changes
(one scalar), never row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Minimum-label connected components over an undirected edge list.

    Returns (id, component) with ``component`` = the smallest node id
    reachable from ``id``. Isolated nodes don't appear (callers join
    back to the full node set with a coalesce-to-self default).
    Deterministic: pure min-aggregation, no RNG, no ordering reliance.
    """
    if max_iterations < 1:
        # A zero/negative budget would skip the loop and silently return
        # the initial self-labels — exactly the wrong-labels outcome the
        # non-convergence guard below exists to prevent.
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    # Materialize the symmetrized edge list ONCE: every iteration joins
    # against it, and without this the upstream edge-derivation plan
    # (often an expensive LSH pipeline) would re-execute per round.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    n_changed = 0
    for _ in range(max_iterations):
        # candidate label for v = min over neighbours u of label(u)
        neighbour_min = (
            sym.join(labels, sym.u == labels.id)
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbour_min, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    if n_changed > 0:
        # Exhausting the budget with labels still moving means the
        # component map is WRONG (a >max_iterations-hop chain would
        # silently split/merge clusters). Fail loudly; callers with
        # genuinely deep graphs raise max_iterations.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({n_changed} labels still changing); the graph "
            f"diameter exceeds the iteration budget — raise max_iterations"
        )
    return labels


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster assignment for every document: component id for matched
    docs, its own id for singletons — the keep/drop decision surface
    (keep ``id == cluster`` representatives, drop the rest).
    One broadcast-or-shuffle left join against the (tiny relative to
    the corpus) component map."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("id", id_col), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (each edge contributes
    both directions), fixed iteration count. Returns (id, rank);
    ranks over all nodes sum to ~1.

    Same distributed shape as :func:`connected_components`: the
    symmetrized edge list and per-node degree are materialized once
    (every iteration joins them), each round is one join + one hash
    aggregate re-keyed on the destination, and localCheckpoint
    truncates the growing lineage so round N's plan doesn't replay
    rounds 0..N-1. Nothing node-proportional ever reaches the driver
    — the only scalar is the node count, and the undirected graph has
    no dangling nodes (every node has degree ≥ 1) so no dangling-mass
    collect either. Iteration count is fixed rather than
    residual-checked: a residual test would add a per-round scalar
    aggregate for little benefit at the typical 10-20 rounds.

    Not SQL-oracle-able (grouped aggregation inside recursion is
    outside portable recursive CTEs); semantics pinned against a
    numpy power-iteration in tests/test_graph_sampling.py.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()  # node-universe scalar (dimension-sized)
    if n == 0:
        # empty graph: no nodes, no ranks (mirrors connected_components
        # returning no labels for an empty edge list)
        return edges.sparkSession.createDataFrame([], "id long, rank double")
    base = (1.0 - damping) / n
    # fold 1/deg into the edge list ONCE: each iteration is then a
    # single join + aggregate instead of join+join+aggregate
    sym_w = (
        sym.join(deg, "u")
        .select("u", "v", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint(eager=True)
    )
    ranks = deg.select("u", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = sym_w.join(ranks, "u").select(
            F.col("v").alias("u"), (F.col("rank") * F.col("w")).alias("c")
        )
        ranks = (
            contrib.groupBy("u")
            .agg((F.lit(base) + F.lit(damping) * F.sum("c")).alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("u").alias("id"), "rank")
