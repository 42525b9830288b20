"""Training-data curation operators: decontamination + deterministic
sampling. Both are pure column pipelines (no UDF, no collect) designed
for the 100 TB corpus side.

- :func:`ngram_contamination` — train/test decontamination: flag corpus
  documents sharing ≥1 token n-gram with any benchmark document (the
  standard 8–13-gram overlap check LLM training pipelines run before a
  corpus ships). Candidates come from a gram-key equijoin — the benchmark
  side is tiny relative to the corpus, so Spark broadcast-converts it;
  never all-pairs.
- :func:`hash_sample` — deterministic per-stratum sampling by content
  hash: keep a row iff the first 4 hex nibbles of md5(key) fall under
  the stratum's fraction. No RNG state, reproducible across engines and
  re-runs (the property a resumable pipeline needs — re-sampling after a
  resume must keep the SAME rows), and shuffle-free (a pure filter that
  pushes nothing but md5 work into the scan stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kglinker.ops.util import explode_token_ngrams, fround, md5_bucket

__all__ = ["ngram_contamination", "hash_sample",
           "temperature_rates", "hash_sample_by_table",
           "split_assign"]


def ngram_contamination(docs: DataFrame, bench: DataFrame,
                        n: int = 8) -> DataFrame:
    """(doc_id, bench_id, n_shared): corpus documents sharing ≥1 distinct
    token ``n``-gram with a benchmark document (self-pairs excluded when
    ids collide). ``bench`` needs (bench_id, text).

    Plan: distinct grams per side → gram equijoin (the benchmark side is
    normally the small build side; no explicit broadcast hint — per the
    r3 advice, a huge benchmark suite's exploded 8-gram table can exceed
    the broadcast cap, so Spark's size-based selection + AQE pick
    broadcast when it fits and fall back to shuffle when it doesn't) →
    count per (doc, bench) pair. The corpus side is one scan + one
    aggregation; corpus bytes never self-join."""
    dg = explode_token_ngrams(docs, n, ["doc_id"]).distinct()
    bg = (explode_token_ngrams(
            bench.select(F.col("bench_id").alias("doc_id"), "text"), n,
            ["doc_id"])
          .distinct()
          .select(F.col("doc_id").alias("bench_id"), F.col("g").alias("bg")))
    return (dg.join(bg, (F.col("g") == F.col("bg"))
                    & (F.col("doc_id") != F.col("bench_id")))
            .groupBy("doc_id", "bench_id")
            .agg(F.count(F.lit(1)).alias("n_shared")))


def hash_sample(docs: DataFrame, fractions: dict[str, float],
                stratum_col: str = "lang",
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic stratified sample: keep a row iff
    ``int(md5(key)[:4], 16) < fraction(stratum) * 65536``.

    ``fractions``: stratum value → keep fraction in [0, 1]; strata not
    listed are DROPPED (explicit mixes only — silence is not a sampling
    decision). md5 of the row key makes the decision a pure function of
    the row, so re-runs, resumes, and other engines (the DuckDB oracle)
    select the identical row set."""
    bucket = md5_bucket(F.col(key_col))
    frac = None
    for k in sorted(fractions):
        cond = F.col(stratum_col) == k
        thr = F.lit(int(fractions[k] * 65536))
        frac = F.when(cond, thr) if frac is None else frac.when(cond, thr)
    frac = frac.otherwise(F.lit(0)) if frac is not None else F.lit(0)
    return docs.filter(bucket < frac)


def temperature_rates(docs: DataFrame, stratum_col: str = "lang") -> DataFrame:
    """(stratum, n_docs, n_tokens, p, rate): per-stratum sampling RATES
    for temperature-balanced multilingual mixing at α = 0.5 (the
    XLM/mBERT-style rebalancing: target mixture q_l ∝ p_l^α, achieved
    WITHOUT upsampling by keeping stratum *l* at rate
    p^(α−1)_l / max_m p^(α−1)_m — at α = 0.5 that is
    ``rate_l = sqrt(p_min / p_l)``: the rarest stratum keeps everything,
    hot strata downsample toward the tempered mixture).

    α is pinned to 0.5 deliberately: the rate then needs only ``sqrt``
    and division, both correctly-rounded under IEEE-754 in every engine
    — the DuckDB oracle replays it bit-identically, which a general
    ``pow`` (not correctly rounded) could not guarantee. Probabilities
    are measured in TOKENS (the unit a training mixture is specified
    in), not documents.

    One aggregation over the corpus + a scalar-sized (per-stratum)
    window — the profile table is |strata| rows, never corpus-sized."""
    from pyspark.sql.window import Window
    per = (docs.groupBy(F.col(stratum_col).alias("stratum"))
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.size(F.split("text", " "))).alias("n_tokens")))
    w = Window.partitionBy()
    p = F.col("n_tokens") / F.sum("n_tokens").over(w)
    p_min = F.min(p).over(w)
    return (per.withColumn("p", p)
            .withColumn("rate", F.sqrt(p_min / F.col("p")))
            .select("stratum", "n_docs", "n_tokens",
                    fround(F.col("p"), 6).alias("p"),
                    fround(F.col("rate"), 6).alias("rate")))


def hash_sample_by_table(docs: DataFrame, rates: DataFrame,
                         stratum_col: str = "lang",
                         key_col: str = "doc_id",
                         rate_col: str = "rate") -> DataFrame:
    """Deterministic stratified sample with DATA-DRIVEN rates: like
    :func:`hash_sample` but the per-stratum fractions come from a
    ``rates`` table (stratum, rate ∈ [0, 1]) instead of a Python dict —
    the fully-distributed composition with :func:`temperature_rates`
    (no ``collect`` between computing the mixture and applying it; on a
    cluster the |strata|-row rate table broadcast-joins onto the scan).
    Strata absent from ``rates`` are DROPPED, matching ``hash_sample``'s
    explicit-mix contract. Keep rule: ``int(md5(key)[:4], 16) <
    floor(rate * 65536)`` — a pure function of the row, identical
    across engines, re-runs, and resumes."""
    bucket = md5_bucket(F.col(key_col))
    r = rates.select(F.col("stratum").alias(stratum_col),
                     F.floor(F.col(rate_col) * 65536).alias("_thr"))
    return (docs.join(r, stratum_col)
            .filter(bucket < F.col("_thr"))
            .drop("_thr"))


def split_assign(docs: DataFrame, weights: dict[str, float] | None = None,
                 key_col: str = "doc_id") -> DataFrame:
    """(input columns…, split): deterministic train/val/test assignment
    by md5-bucket RANGES — the holdout-split primitive every dataset
    release needs. Split names are processed in sorted order; split *s*
    owns buckets ``[floor(cum_before·65536), floor(cum_incl·65536))``,
    so assignments are (a) a pure function of the row key — stable
    across re-runs, resumes, engines, and corpus growth (a doc never
    changes split when other docs are added, the property row-number
    splits lack), and (b) disjoint by construction. Rows beyond the
    total weight (when Σweights < 1) are DROPPED, matching
    :func:`hash_sample`'s explicit-mix contract; Σweights may not
    exceed 1."""
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    bucket = md5_bucket(F.col(key_col))
    expr = None
    cum = 0.0
    for name in sorted(weights):
        cum += weights[name]
        if abs(cum - 1.0) <= 1e-9:
            # float accumulation can land at 0.99999999…: without the
            # snap the last threshold becomes 65535, silently dropping
            # bucket 65535 (~1/65536 of docs) from a weight set the
            # user wrote to be exhaustive (mirrors the over-unity
            # tolerance on the sum check above)
            cum = 1.0
        thr = F.lit(int(cum * 65536))
        expr = (F.when(bucket < thr, name) if expr is None
                else expr.when(bucket < thr, name))
    return (docs.withColumn("split", expr)
            .filter(F.col("split").isNotNull()))
