"""Iterative graph analytics as DataFrame loops.

Connected components (the min-label-propagation / pointer-jumping shape)
lives in ``operators/dedup.py`` next to its dedup use case; this module
holds the other canonical Pregel-style iteration: power-iteration
PageRank. Both follow the same scale discipline — per-iteration work is
a bounded number of key-partitioned shuffles, lineage is truncated with
``localCheckpoint`` so the plan does not grow with the iteration count,
and nothing is collected to the driver.

Reference parity note: the reference (241-LoC MQTT bridge) has no graph
operators; this is an engine extension for the curation/analytics layer
(link-graph ranking for web-corpus curation, Markov stationary
distributions over event-transition graphs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import col


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str | None = None, iterations: int = 3,
             damping: float = 0.85,
             checkpoint_every: int = 5) -> DataFrame:
    """Weighted PageRank by power iteration over an edge DataFrame.

    rank_{k+1}(v) = (1-d)/N + d * ( sum_{(u,v) in E} rank_k(u) * p(u,v)
                                    + dangling_mass_k / N )

    where p(u,v) is the row-normalized out-weight of edge (u,v) and
    dangling_mass is the rank held by nodes with no out-edges,
    redistributed uniformly (the standard convention — without it rank
    mass leaks and the result is not a distribution).

    Scale shape (the 100 TB contract):
    - Parallel edges are pre-aggregated and out-normalized in ONE pass
      (a src-keyed window), then the edge set is ``localCheckpoint``-ed:
      every iteration reuses the materialized, already-shuffled edges
      instead of recomputing the normalization lineage.
    - Each iteration is two key-partitioned shuffles (join ranks on src,
      aggregate contributions on dst) — the minimum for vanilla
      PageRank. Hub skew is AQE's skew-join territory; no driver loops,
      no collect (the N and dangling-mass scalars ride as 1-row
      broadcast joins inside the same job).
    - ``ranks`` lineage is truncated every ``checkpoint_every``
      iterations, same discipline as ``dedup.connected_components``.

    Returns (node, rank) with ranks summing to ~1.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = (col(weight) if weight is not None else F.lit(1.0)) \
        .cast("double").alias("w")
    e = (
        edges.select(col(src).alias("src"), col(dst).alias("dst"), w)
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
    )
    e = (
        e.withColumn(
            "p", col("w") / F.sum("w").over(Window.partitionBy("src"))
        )
        .drop("w")
        .localCheckpoint()
    )

    nodes = (
        e.select(col("src").alias("node"))
        .union(e.select(col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    # nodes with no out-edges hold the dangling mass
    dangling_nodes = nodes.join(
        e.select("src").distinct(),
        nodes["node"] == col("src"), "left_anti",
    )

    ranks = (
        nodes.crossJoin(F.broadcast(n1))
        .select("node", (F.lit(1.0) / col("n_nodes")).alias("rank"))
    )
    d = float(damping)
    for i in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(col("rank") * col("p")).alias("c"))
        )
        dmass = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dmass))
            .select(
                "node",
                (
                    F.lit((1.0 - d)) / col("n_nodes")
                    + F.lit(d) * (F.coalesce(col("c"), F.lit(0.0))
                                  + col("dm") / col("n_nodes"))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    return ranks
