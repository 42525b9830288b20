"""Graph analytics over the KG edge tables.

PageRank as a DataFrame join-agg loop — the canonical iterative graph
op on Spark without GraphFrames: per iteration one join (ranks onto the
co-located edge list) and one aggregation (contribution sum per dst).
Ranks are fround-ed to 6 dp after every iteration so the computation is
bit-reproducible across engines (the DuckDB oracle unrolls the same
iterations — the IVF-Lloyd replay pattern).

Scale: the edge list is persisted/co-partitioned once and reused every
iteration (the shuffle key never changes, so AQE reuses the exchange);
rank state is a (node, rank) table, never driver-side. The iteration
count is fixed and small (PageRank on KG entity graphs is used as a
feature, not run to convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kglinker.ops.util import fround

__all__ = ["pagerank"]


def pagerank(edges: DataFrame, iters: int = 3,
             damping: float = 0.85) -> DataFrame:
    """(node, rank) after ``iters`` power iterations on the UNDIRECTED
    graph of (src, dst) edges; rank_0 = 1/n, rank_{k+1} =
    (1−d)/n + d·Σ rank_k(neighbor)/deg(neighbor), fround 6 dp each step.
    Co-occurrence edges are undirected by construction (src < dst), so
    each edge contributes both ways; every node has degree ≥ 1 (no
    dangling mass)."""
    und = (edges.select("src", "dst")
           .unionByName(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
           .persist())
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = und.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    ranks = nodes.withColumn("rank", fround(F.lit(1.0 / n), 6))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contribs = (und
                    .join(ranks, und["src"] == ranks["node"])
                    .join(deg, "src")
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("deg")).alias("c")))
        ranks = (contribs.groupBy("node")
                 .agg(fround(F.lit(base) + F.lit(damping) * F.sum("c"), 6)
                      .alias("rank")))
    return ranks
