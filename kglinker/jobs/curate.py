"""End-to-end training-data curation pipeline: the composition the
individual operators exist for.

    documents
      → quality gates   (text_quality score + repetition + logprob)
      → exact dedup     (md5 survivor)
      → near-dup dedup  (minhash-LSH clusters, keep cluster min)
      → decontamination (8-gram overlap vs a benchmark set)
      → stratified sample (deterministic md5-bucket per language)
      → chunk + pack    (context-window layout)

Each stage is the registered operator — this module only wires them, so
the per-stage semantics stay oracle-gated. Run:

    PYTHONPATH=/root/repo python -m kglinker.jobs.curate \
        /root/testdata/sf0.01 /tmp/kgl_curated

Scale: stages communicate through doc_id semi-joins (never text
re-shuffles); at 100 TB materialize the survivor id set per stage (or
fold stages into one pass where filters are row-local) and keep the
corpus bucketed by doc_id so the semi-joins are storage-partitioned.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["curate"]

QUALITY_MIN = 0.35         # text_quality score floor (the
                           # synthetic docs are ~50 tokens, so the
                           # length component tops out near 0.2)
REP_MAX = 0.6              # max duplicate-bigram fraction
MINHASH_N, MINHASH_BANDS = 64, 16
SAMPLE_FRACS = {"en": 1.0, "de": 1.0, "cs": 1.0, "fr": 0.5, "es": 0.5,
                "zh": 1.0}
CHUNK_T, CHUNK_OVL, PACK_SEQ = 128, 16, 512


def curate(spark: SparkSession, sf_dir: str,
           out_dir: str | None = None,
           max_dup_frac: float | None = None,
           dup_k: int = 8) -> dict:
    """Run the full curation chain over ``sf_dir``/documents.parquet;
    returns per-stage survivor counts (and writes chunks/packing parquet
    under ``out_dir`` when given).

    ``max_dup_frac`` (opt-in, r6) adds a repeated-substring stage after
    near-dup dedup: docs whose fraction of tokens inside corpus-repeated
    ``dup_k``-token spans exceeds the threshold are dropped (the
    exact-substring memorization signal, Lee et al. 2022). Default None
    keeps the registered ⊕ curate_funnel chain byte-stable."""
    from kglinker.graph.canonicalize import connected_components_star
    from kglinker.ops.chunking import chunk_documents, pack_documents
    from kglinker.ops.dedup import exact_dedup_groups, minhash_lsh_pairs
    from kglinker.ops.sampling import hash_sample, ngram_contamination
    from kglinker.ops.textstats import repetition_stats, text_quality

    from kglinker.runtime.partitioning import fan_out
    # fan_out at the scan (r5): the minhash/n-gram stages are CPU-bound
    # per-row; a single-row-group test file would serialize them
    docs = fan_out(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")))
    counts = {"input": docs.count()}

    # each stage materializes its survivor set once (r4 review fix:
    # lazy chaining re-ran every upstream stage per downstream count —
    # O(stages²) full passes); the previous stage's cache is released
    prev = [None]

    def _mat(df, key):
        df = df.persist()
        counts[key] = df.count()
        if prev[0] is not None:
            prev[0].unpersist()
        prev[0] = df
        return df

    # 1. quality gates (row-local → one pass, no shuffle between them)
    q = text_quality(docs).filter(F.col("quality_score") >= QUALITY_MIN) \
        .select("doc_id")
    rep = repetition_stats(docs).filter(F.col("dup_gram_frac") <= REP_MAX) \
        .select("doc_id")
    docs = _mat(docs.join(q, "doc_id").join(rep, "doc_id"),
                "after_quality")

    # 2. exact dedup: keep the min-doc_id survivor per md5(text)
    keep = exact_dedup_groups(docs).select(
        F.col("keep_doc_id").alias("doc_id"))
    docs = _mat(docs.join(keep, "doc_id"), "after_exact_dedup")

    # 3. near-dup clusters → keep the cluster representative
    pairs = minhash_lsh_pairs(docs, MINHASH_N, MINHASH_BANDS, 0.5)
    cc = connected_components_star(
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst")))
    losers = cc.filter(F.col("node") != F.col("comp")) \
        .select(F.col("node").alias("doc_id"))
    docs = _mat(docs.join(losers, "doc_id", "left_anti"),
                "after_neardup")

    # 3b. (opt-in) repeated-substring filter over the SURVIVORS —
    # corpus-wide repeated spans are recomputed on the deduped set, so
    # boilerplate shared only by removed near-dups no longer counts
    if max_dup_frac is not None:
        from kglinker.ops.dedup import duplication_fraction
        heavy = (duplication_fraction(docs, k=dup_k)
                 .filter(F.col("dup_frac") > max_dup_frac)
                 .select("doc_id"))
        docs = _mat(docs.join(heavy, "doc_id", "left_anti"),
                    "after_repeated_spans")

    # 4. decontamination vs a benchmark stand-in: every 50th SURVIVOR
    # (r4 advice: sampling the raw corpus let a survivor be removed
    # because its already-deduplicated near-duplicate landed in the
    # benchmark set — silent over-removal in the funnel counts)
    bench = (docs.filter(F.col("doc_id") % 50 == 0)
             .select(F.col("doc_id").alias("bench_id"), "text"))
    dirty = ngram_contamination(docs, bench).select("doc_id").distinct()
    docs = _mat(docs.join(dirty, "doc_id", "left_anti"),
                "after_decontamination")

    # 5. deterministic language-stratified sampling
    docs = _mat(hash_sample(docs, SAMPLE_FRACS), "after_sampling")

    # 6. context-window layout
    chunks = chunk_documents(docs, CHUNK_T, CHUNK_OVL)
    packing = pack_documents(docs, PACK_SEQ)
    counts["n_chunks"] = chunks.count()
    # total sequences per (group, shard) = ceil(shard token total /
    # PACK_SEQ) — counting DISTINCT seq_idx a doc starts in would
    # under-report whenever a long document spans starter-less sequences
    # (r4 review fix); sequences are numbered per shard since r5
    counts["n_sequences"] = int(
        packing.groupBy("source", "lang", "shard")
        .agg(F.ceil(F.sum("n_tokens") / PACK_SEQ).alias("ns"))
        .agg(F.coalesce(F.sum("ns"), F.lit(0)).alias("t"))
        .collect()[0]["t"])
    if out_dir:
        chunks.write.mode("overwrite").parquet(
            os.path.join(out_dir, "chunks"))
        packing.write.mode("overwrite").parquet(
            os.path.join(out_dir, "packing"))
    if prev[0] is not None:
        prev[0].unpersist()
    return counts


def main() -> None:
    from kglinker.runtime.session import get_spark
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("kgl-curate")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(curate(spark, sf_dir, out)))


if __name__ == "__main__":
    main()
