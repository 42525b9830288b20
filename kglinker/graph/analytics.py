"""Graph analytics over the KG edge tables.

PageRank as a DataFrame join-agg loop — the canonical iterative graph
op on Spark without GraphFrames: per iteration one join (ranks onto the
co-located edge list) and one aggregation (contribution sum per dst).
Ranks are fround-ed to 6 dp after every iteration so the computation is
bit-reproducible across engines (the DuckDB oracle unrolls the same
iterations — the IVF-Lloyd replay pattern).

Scale: the incoming edge list is checkpointed FIRST (r7 — its lineage
appears twice in the undirected union, so without this the full upstream
pipeline evaluates per reference and every iteration job re-analyzes it),
then the degree-annotated edge list is persisted and reused every
iteration (pre-joining deg keeps each iteration to ONE join); rank state
is a (node, rank) table, never driver-side. The iteration count is fixed
and small (PageRank on KG entity graphs is used as a feature, not run to
convergence). The final rank table is materialized via
``localCheckpoint`` and the edge cache released before returning (same
lifecycle as canonicalize.py's connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kglinker.ops.util import fround

__all__ = ["pagerank"]


def pagerank(edges: DataFrame, iters: int = 3,
             damping: float = 0.85, directed: bool = False) -> DataFrame:
    """(node, rank) after ``iters`` power iterations on the (src, dst)
    edge list; rank_0 = 1/n, fround 6 dp each step.

    ``directed=False`` (the co-occurrence default): each edge contributes
    both ways — rank_{k+1} = (1−d)/n + d·Σ rank_k(neighbor)/deg(neighbor).
    Co-occurrence edges are undirected by construction (src < dst) and
    every node has degree ≥ 1, so there is no dangling mass.

    ``directed=True``: contributions flow src→dst with out-degree
    normalization, and the rank mass of dangling nodes (no out-edges) is
    redistributed uniformly each iteration — the standard correction;
    without it sink nodes leak mass and ranks stop summing to 1. The
    dangling mass is a 1-row in-plan aggregate broadcast onto the rank
    update (r6: no per-iteration driver collect — one job per iteration,
    the checkpoint); zero-in-degree nodes are kept at the base + dangling
    share via a left join on the node set."""
    # materialize the edge list FIRST (r7): the undirected union (and the
    # deg self-reference below) put the edge lineage in the plan TWICE —
    # without this the entire upstream pipeline (at 100 TB: the full
    # extraction) evaluates once per reference. The aggregated edge list
    # is orders of magnitude smaller than its inputs, so the checkpoint
    # is the cheap side of that trade; it also truncates the logical plan
    # every iteration job would otherwise re-analyze. Measured sf0.1:
    # pagerank wall 5.1 → ~2.6 s, plan-identical ranks.
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    g = edges
    if not directed:
        g = g.unionByName(edges.select(F.col("dst").alias("src"),
                                       F.col("src").alias("dst")))
    # persist the DEGREE-ANNOTATED edge list: pre-joining deg once (r5)
    # removes one join — and its exchanges — from EVERY iteration; the
    # contribution arithmetic is unchanged (rank/deg per edge). persist
    # (not localCheckpoint) deliberately: iteration joins against an
    # InMemoryRelation plan measurably fewer AQE stage jobs per round
    # than against a checkpointed RDD leaf (8 vs 10/iter, the
    # tests/test_graph.py ceiling) — the lineage above it is already a
    # one-line checkpoint scan, so the r6 cache-lifetime concern is gone.
    deg = g.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    gd = g.join(deg, "src").persist()
    # every edge survives into gd (its src has deg ≥ 1), so gd covers the
    # full node set on both endpoints
    nodes = (gd.select(F.col("src").alias("node"))
             .unionByName(gd.select(F.col("dst").alias("node")))
             .distinct())
    n = nodes.count()
    ranks = nodes.withColumn("rank", fround(F.lit(1.0 / n), 6))
    base = (1.0 - damping) / n
    # the DANGLING node set (no out-edges) is iteration-invariant —
    # compute it ONCE (r7; it used to be re-derived per iteration as an
    # anti-join against the out-degree set); each iteration then sums
    # ranks over a broadcast semi-join against this tiny checkpointed
    # set — identical rows, identical sum
    dang_nodes = None
    if directed:
        src_nodes = gd.select("src").distinct()
        dang_nodes = (nodes.join(src_nodes,
                                 nodes["node"] == src_nodes["src"],
                                 "left_anti")
                      .localCheckpoint(eager=True))
    for _ in range(iters):
        contribs = (gd
                    .join(ranks, gd["src"] == ranks["node"])
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("deg")).alias("c")))
        if directed:
            # dangling mass stays IN-PLAN (r5 verdict #8): the 1-row
            # aggregate is broadcast onto the per-node frame instead of
            # collected, dropping the per-iteration driver job; the
            # arithmetic is unchanged (same sum, same double division by
            # n, fround after), so the gate stays hash-exact
            dang = (ranks.join(F.broadcast(dang_nodes), "node", "semi")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")))
            sums = contribs.groupBy("node").agg(F.sum("c").alias("s"))
            ranks = (nodes.join(sums, "node", "left")
                     .crossJoin(F.broadcast(dang))
                     .select("node",
                             fround(F.lit(base) + F.lit(damping)
                                    * (F.coalesce(F.col("s"), F.lit(0.0))
                                       + F.col("_dm") / F.lit(float(n))), 6)
                             .alias("rank")))
            # materialize per round: without this the lineage re-runs all
            # previous rounds each time — O(k²) join rounds (the CC
            # per-round lifecycle; r4 review fix). Now the ONLY job per
            # iteration.
            ranks = ranks.localCheckpoint(eager=True)
        else:
            # every node has degree ≥ 1 → receives ≥ 1 contribution;
            # formula kept verbatim from r3 (the DuckDB gate replays it)
            ranks = (contribs.groupBy("node")
                     .agg(fround(F.lit(base) + F.lit(damping) * F.sum("c"), 6)
                          .alias("rank")))
    ranks = ranks.localCheckpoint(eager=True)
    gd.unpersist()
    return ranks
