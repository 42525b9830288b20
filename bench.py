"""Benchmark harness: headline queries + the full KG pipeline at
``$SPARK_GRAFT_SF_DIR`` on ``local[$SPARK_GRAFT_CPUS]``.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
"turns_per_sec": ..., "n_turns": ..., "cpus": ...}``

The KG pipeline benchmark synthesizes transcripts sized to the scale
factor (≈ lineitem_rows / 20 conversations) so throughput is measured on a
corpus that grows with sf, and reports turns/sec — the BASELINE.json
throughput unit. Run at two parallelism levels (SPARK_GRAFT_CPUS=8 vs 32)
for the N→4N scaling-efficiency evidence (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from kglinker.queries import QUERIES
    from kglinker.runtime.session import get_spark

    spark = get_spark("kglinker-bench", cores=cpus,
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    timings: dict[str, float] = {}

    # warm-up (excluded, scaling_bench protocol): spin up codegen, parquet
    # reader and executor threads so the FIRST timed query doesn't absorb
    # one-time JVM costs that vanish on any long-lived cluster
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .selectExpr("count(distinct doc_id)", "sum(length(text))").collect()

    # headline registry queries (documents/embeddings driven)
    for name, q in QUERIES.items():
        if not q.headline or name.startswith("kg_pipeline"):
            continue
        t0 = time.time()
        q.fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    # SPARK_GRAFT_WARM=1: re-run each headline query in the same session
    # and report steady-state walls too (the cold numbers above include
    # one-time codegen compile — e.g. the 64-column minhash aggregate —
    # which a long-lived cluster pays once, not per query)
    warm: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_WARM") == "1":
        for name, q in QUERIES.items():
            if not q.headline or name.startswith("kg_pipeline"):
                continue
            t0 = time.time()
            q.fn(spark, sf_dir).count()
            warm[name] = round(time.time() - t0, 3)

    # full KG pipeline over sf-scaled synthetic transcripts
    from kglinker.data.transcripts import transcripts_df
    from kglinker.extract.stage import extract_mentions
    from kglinker.graph.triples import build_triples
    from kglinker.jobs.pipeline import build_kb_side

    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    n_convs = max(200, int(lineitem.count() / 20))
    # SPARK_GRAFT_CONVS overrides the corpus size (the sf1-scale growth
    # point: 300000 convs ≈ 2.1M turns — BENCH/BASELINE.md records it)
    n_convs = int(os.environ.get("SPARK_GRAFT_CONVS", n_convs))
    kb_scored, art, canon = build_kb_side(spark)

    t0 = time.time()
    transcripts = transcripts_df(spark, n_convs).cache()
    n_turns = transcripts.count()
    gen_s = time.time() - t0

    t0 = time.time()
    mentions = extract_mentions(transcripts, art).cache()
    n_mentions = mentions.count()
    extract_s = time.time() - t0
    timings["kg_pipeline_extract"] = round(extract_s, 3)

    t0 = time.time()
    n_triples = build_triples(mentions, kb_scored, canon).count()
    timings["kg_pipeline_triples"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_convs": n_convs,
        "n_turns": n_turns,
        "n_mentions": n_mentions,
        "n_triples": n_triples,
        "gen_sec": round(gen_s, 3),
        "turns_per_sec": round(n_turns / extract_s, 1),
    }
    if warm:
        out["queries_warm"] = warm
        out["warm_total"] = round(sum(warm.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
