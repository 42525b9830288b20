"""Scale/skew tests (SURVEY §5): hot-key fixtures must not break or
degenerate the plans."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hot_tool_conversations(spark, kb_scored, artifacts_bcast):
    """One tool name in ~every turn of many conversations (the skew
    fixture): extraction + salted edge aggregation complete and weights
    are exact."""
    from kglinker.extract.stage import extract_mentions
    from kglinker.graph.triples import cooccurrence_triples
    from datetime import datetime, timedelta
    base = datetime(2025, 1, 1)
    rows = []
    for c in range(120):
        for t in range(6):
            rows.append((f"hot_{c:04d}", t, "user",
                         "I asked SearchTool to summarize Praha .", "SearchTool",
                         base + timedelta(minutes=c, seconds=t)))
    from kglinker.data.transcripts import TRANSCRIPTS_SCHEMA
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    mentions = extract_mentions(df, artifacts_bcast, num_partitions=8)
    edges = cooccurrence_triples(mentions, salt_buckets=8)
    got = {(r["subj"], r["obj"]): r["weight"] for r in edges.collect()}
    # SearchTool(11) × Praha-canonical(12): every conversation carries it
    assert got[("11", "12")] == 120


def test_salted_agg_is_two_stage(spark):
    """The salted count's physical plan aggregates twice (partial spread
    over salt, then merge) — the explicit skew handling of north_rule."""
    from kglinker.runtime.partitioning import salted_count
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v"))
    plan = salted_count(df, ["k"], salt_buckets=8)._jdf.queryExecution() \
        .executedPlan().toString()
    # two logical agg levels → ≥4 HashAggregate operators (partial+final ×2)
    assert plan.count("HashAggregate") >= 4
    assert "_salt" in plan


def test_dedup_hot_bucket_identical_docs(spark):
    """Pathological skew for the banded joins (r4): hundreds of IDENTICAL
    docs collapse into one band bucket / one simhash block value — the
    hot-key case the docstrings hand to AQE. Both operators must complete
    and emit exactly C(n,2) pairs at est_sim=1 / hamming=0."""
    from kglinker.ops.dedup import minhash_lsh_pairs, simhash_pairs
    n = 120
    rows = [(i, "the exact same boilerplate text repeated verbatim here",
             "en", "web", 0) for i in range(n)]
    rows.append((n, "one document that is completely different entirely",
                 "en", "web", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    want = n * (n - 1) // 2

    mh = minhash_lsh_pairs(docs, num_hashes=64, bands=16, min_est=0.5)
    got = mh.collect()
    assert len(got) == want
    assert all(r["est_sim"] == 1.0 for r in got)

    sh = simhash_pairs(docs, bits=64, k=3)
    got = sh.collect()
    assert len(got) == want
    assert all(r["hamming"] == 0 for r in got)


def test_dedup_plans_no_nested_loop(spark):
    """The production-parameter candidate generation must stay a bucket
    EQUIJOIN: no CartesianProduct / BroadcastNestedLoopJoin anywhere in
    the executed plans (the all-pairs shapes that die at corpus scale)."""
    from kglinker.ops.dedup import minhash_lsh_pairs, simhash_pairs
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (minhash_lsh_pairs(docs, 64, 16, 0.5),
               simhash_pairs(docs, 64, 3)):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
