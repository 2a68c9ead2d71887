"""L7 -- connected-components canonicalization (SURVEY.md §2.5).

Iterative min-label propagation over an undirected edge DataFrame:
each round is one hash join + one min-aggregation; lineage is cut with
``localCheckpoint`` every iteration so the plan doesn't grow with the
iteration count (SURVEY.md §4). Converges in O(component diameter)
rounds; alias graphs are shallow (star-ish), so 2-4 rounds in practice.

Scale notes: the join key is the node id -- skew (a hub node in a
mega-component) is handled by AQE skew-join splitting (enabled in
session.py); the per-round ``groupBy(node).min(label)`` does map-side
partial aggregation for free. For trillion-edge graphs the same loop
applies with a two-phase large-star/small-star variant; the fixpoint
test (`changed == 0`) is a cheap count on a boolean join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    small_threshold: int = 50_000,
) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min node id
    (lexicographic) in the node's component. Deterministic.

    Adaptive execution: a graph under `small_threshold` edges (e.g. an
    alias dictionary) is union-found on the driver in one pass -- the
    distributed loop's per-round job latency would dominate it. Larger
    graphs take the iterative path. Same results either way (tested)."""
    from pyspark import StorageLevel

    # persist: the size probe (limit.count) and the fast-path collect /
    # iterative rounds would otherwise each re-run the upstream distinct
    # (a full shuffle of the edge source -- 17M rows in the codekg
    # pipeline) once per action
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if small_threshold and sym.limit(small_threshold + 1).count() <= small_threshold:
        pairs = [(r["a"], r["b"]) for r in sym.collect()]
        sym.unpersist()
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = [(n, find(n)) for n in parent]
        return edges.sparkSession.createDataFrame(rows, ["node", "component"])
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # pull the best label visible through one hop
        via_edge = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(via_edge)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()  # labels are localCheckpoint'ed, independent of sym
    return labels
