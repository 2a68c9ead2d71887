"""KG analytics over the constructed node/edge tables: PageRank.

The reference stops at extracting field records (`extractorAvaluos.py:
933-956`); once those records become node/edge tables (the north-rule
output), ranking entities by link structure is the first analytics a
KG consumer runs. This is the standard power-iteration PageRank
(Page et al., 1999) expressed as a fixed-iteration DataFrame loop --
fixed because a convergence test is a per-round driver action AND
makes the result depend on float noise; a pinned iteration count is
deterministic and oracle-able (the DuckDB twin unrolls the same
iterations as chained CTEs).

Scale design (the pregel-shaped part):

- Each iteration is ONE join (edges x ranks, on src) + ONE aggregation
  (contributions by dst). The edge frame is hash-repartitioned on src
  once and persisted, so every iteration's join re-shuffles only the
  |V|-sized rank frame, never the |E|-sized edge frame; the
  contribution aggregation does map-side partial aggregation on dst
  for free.
- Lineage is CUT (eager ``localCheckpoint``) on the edge/node frames
  at entry and on every iteration's rank frame -- the same discipline
  cc.py uses. Persist alone is not enough: the logical plan of
  iteration k still embeds the full upstream subtree (here: the whole
  KG pipeline) once per join that references it, so analysis cost --
  and driver heap for the plan trees -- grows linearly with
  iterations and blows up when the input plan is itself large
  (observed: OOM at 5 iterations over the composed build_kg plan).
- Dangling nodes (no out-edges) either leak their mass (``dangling=
  "leak"``) or redistribute it uniformly (``dangling="redistribute"``,
  the textbook formulation). Redistribution costs one driver-side
  scalar aggregate per iteration over the persisted |V|-sized rank
  frame -- bounded, never over the edge stream.
- Ranks are float64 all the way; consumers that hash-compare across
  engines should round (the driver query rounds to 6 dp, the shared
  determinism contract the IVF-PQ ADC scan also uses).

Hub skew (a node with huge in-degree) concentrates one dst group; the
aggregation's map-side combine collapses per-partition contributions
first, so the reduce-side group sees at most one row per map
partition -- the same reason the exact-dedup groupBy tolerates hot
sha keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    dangling: str = "redistribute",
) -> DataFrame:
    """Fixed-iteration power-method PageRank over a directed edge list.

    Returns (node, rank) with sum(rank) == 1 (up to float noise) when
    ``dangling="redistribute"``; with ``"leak"`` dangling mass decays
    each round (sum < 1), matching implementations that skip the
    dangling term. Duplicate edges are collapsed first (unweighted
    semantics); self-loops count like any other edge.
    """
    if dangling not in ("redistribute", "leak"):
        raise ValueError(f"unknown dangling mode: {dangling!r}")
    spark = edges.sparkSession
    # eager localCheckpoint: materializes AND truncates lineage, so the
    # per-iteration plans reference a leaf, not the caller's upstream
    # pipeline (see module docstring)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node string, rank double")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("_od"))
    # edges carry their source's out-degree and are partitioned on src
    # ONCE; every iteration's join then exchanges only the rank frame
    ee = e.join(deg, "src").repartition("src").localCheckpoint()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(iterations):
        dm = 0.0
        if dangling == "redistribute":
            # mass parked on nodes with no out-edges, redistributed
            # uniformly: a scalar agg on the persisted |V|-sized frame
            row = (
                ranks.join(deg.withColumnRenamed("src", "node"), "node", "left_anti")
                .agg(F.sum("rank"))
                .first()
            )
            dm = row[0] or 0.0
        contrib = (
            ee.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("_od")).alias("_contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base + damping * dm / n)
                    + F.lit(damping) * F.coalesce("_contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()  # cut lineage: O(1)-deep plan per round
        )
    return ranks
