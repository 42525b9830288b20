"""Curation operators: decontamination + deterministic sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from kglinker.ops.sampling import hash_sample, ngram_contamination


def _docs(spark):
    rows = [
        (0, "a b c d e f g h i j", "en"),
        (1, "a b c d e f g h i j", "en"),          # exact dup of 0
        (2, "x a b c d e f g h i j y", "en"),      # contains 0's 8-grams
        (3, "totally different text with no shared eight gram run here", "de"),
        (4, "a b c d e f g X i j", "fr"),          # breaks every 8-gram? no:
                                                   # 'a b c d e f g X' differs
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_ngram_contamination_exact(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") == 0) \
                .select(F.col("doc_id").alias("bench_id"), "text")
    got = {(r["doc_id"], r["bench_id"]): r["n_shared"]
           for r in ngram_contamination(docs, bench, n=8).collect()}
    # doc 0 has 3 distinct 8-grams; doc 1 shares all 3; doc 2 contains the
    # full token run so it also shares all 3; docs 3/4 share none
    assert got == {(1, 0): 3, (2, 0): 3}


def test_hash_sample_deterministic_and_stratified(spark):
    n = 4000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"))
    fr = {"en": 0.5, "de": 0.1}
    a = {r["doc_id"] for r in hash_sample(docs, fr).select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, fr).select("doc_id").collect()}
    assert a == b and a                      # run-to-run identical
    # per-stratum rate within ±15% of the target (md5 is uniform)
    en = sum(1 for i in a if i % 2 == 0) / (n / 2)
    de = sum(1 for i in a if i % 2 == 1) / (n / 2)
    assert abs(en - 0.5) < 0.075 and abs(de - 0.1) < 0.03, (en, de)
    # unlisted strata are dropped entirely
    only_en = hash_sample(docs, {"en": 1.0})
    assert only_en.filter(F.col("lang") == "de").count() == 0
    assert only_en.count() == n / 2


def test_hash_sample_monotone_fractions(spark):
    """A row kept at fraction f stays kept at any f' > f (the bucket
    threshold is monotone) — the property that lets a pipeline GROW a
    sample without resampling the old rows."""
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text"),
        F.lit("en").alias("lang"))
    small = {r["doc_id"] for r in
             hash_sample(docs, {"en": 0.2}).select("doc_id").collect()}
    big = {r["doc_id"] for r in
           hash_sample(docs, {"en": 0.6}).select("doc_id").collect()}
    assert small < big


def test_temperature_rates_alpha_half(spark):
    from kglinker.ops.sampling import hash_sample_by_table, temperature_rates
    rows = []
    # hot stratum: 80 docs x 10 tokens; rare: 5 docs x 10 tokens
    for i in range(80):
        rows.append((i, " ".join(f"a{j}" for j in range(10)), "en", "web", 0))
    for i in range(5):
        rows.append((1000 + i, " ".join(f"b{j}" for j in range(10)),
                     "cs", "web", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    rates = {r["stratum"]: r for r in
             temperature_rates(docs).collect()}
    # the rarest stratum keeps everything; the hot one downsamples by
    # sqrt(p_min/p) = sqrt(5/80) = 0.25
    assert rates["cs"]["rate"] == 1.0
    assert abs(rates["en"]["rate"] - 0.25) < 1e-6
    assert rates["en"]["n_tokens"] == 800 and rates["cs"]["n_tokens"] == 50
    # applying the rates moves the mixture toward the tempered target:
    # en token share drops from 800/850 = 0.94 toward
    # sqrt(0.94)/ (sqrt(0.94)+sqrt(0.06)) ≈ 0.80
    sampled = hash_sample_by_table(docs, temperature_rates(docs))
    by = {r["lang"]: r["n"] for r in
          sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by["cs"] == 5                      # rate 1.0 keeps all
    share = by["en"] / (by["en"] + by["cs"])
    assert share < 0.9                        # balanced-ward, md5-noisy
    # determinism: same rows on a re-run
    a = sorted(r["doc_id"] for r in sampled.collect())
    b = sorted(r["doc_id"] for r in
               hash_sample_by_table(docs, temperature_rates(docs)).collect())
    assert a == b


def test_corpus_profile_exact(spark):
    from kglinker.ops.textstats import corpus_profile
    docs = spark.createDataFrame(
        [(1, "a b c", "en", "web", 0),      # 3 tokens, 5 chars
         (2, "d e f g", "en", "web", 0),    # 4 tokens, 7 chars
         (3, "h i", "en", "books", 0)],
        "doc_id long, text string, lang string, source string, n_chars int")
    prof = {(r["source"], r["lang"]): r for r in corpus_profile(docs).collect()}
    web = prof[("web", "en")]
    assert (web["n_docs"], web["n_tokens"], web["n_chars"]) == (2, 7, 12)
    assert (web["min_tokens"], web["max_tokens"]) == (3, 4)
    assert web["p50_tokens"] == 3.5 and web["p95_tokens"] == 3.95
    books = prof[("books", "en")]
    assert (books["n_docs"], books["n_tokens"], books["min_tokens"],
            books["max_tokens"]) == (1, 2, 2, 2)


def test_split_assign_deterministic_and_growth_stable(spark):
    from kglinker.ops.sampling import split_assign
    docs = spark.createDataFrame(
        [(i, f"t {i}", "en", "web", 0) for i in range(2000)],
        "doc_id long, text string, lang string, source string, n_chars int")
    got = {r["doc_id"]: r["split"]
           for r in split_assign(docs).select("doc_id", "split").collect()}
    # exhaustive (weights sum to 1) and roughly proportioned
    assert len(got) == 2000
    from collections import Counter
    c = Counter(got.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > 1800 and c["val"] < 100 and c["test"] < 100
    # growth stability: adding docs never moves an existing assignment
    more = spark.createDataFrame(
        [(i, f"t {i}", "en", "web", 0) for i in range(4000)],
        "doc_id long, text string, lang string, source string, n_chars int")
    got2 = {r["doc_id"]: r["split"]
            for r in split_assign(more).select("doc_id", "split").collect()}
    assert all(got2[k] == v for k, v in got.items())
    # partial weights drop the remainder explicitly
    sub = split_assign(docs, {"val": 0.25})
    n = sub.count()
    assert 0 < n < 2000
    assert sub.select("split").distinct().collect()[0][0] == "val"
    # over-unity weights rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        split_assign(docs, {"a": 0.7, "b": 0.7})


def test_split_assign_float_cum_snap(spark):
    """r5 ADVICE: weight sets whose floats sum to 1 only after snapping
    (0.3+0.3+0.3+0.1 → 0.9999999999999999) must still be exhaustive —
    without the snap, bucket 65535 (~1/65536 of docs) is silently
    dropped. Include doc keys that md5-hash into bucket 65535."""
    from kglinker.ops.sampling import split_assign
    from kglinker.ops.util import md5_bucket
    rows = [(i, "t", "en", "web", 0) for i in range(60000)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    top = docs.select(md5_bucket(F.col("doc_id")).alias("b")) \
              .filter(F.col("b") == 65535).count()
    assert top > 0, "fixture must contain at least one bucket-65535 key"
    w = {"a": 0.3, "b": 0.3, "c": 0.3, "d": 0.1}
    assert abs(sum(w.values()) - 1.0) > 0 and abs(sum(w.values()) - 1.0) <= 1e-9
    assert split_assign(docs, w).count() == 60000
