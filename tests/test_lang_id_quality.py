"""Language-ID and quality scoring behave sensibly on real running text
(the profiles are wide enough to separate languages, not single-sentence
toys)."""

from __future__ import annotations

from kglinker.ops.textstats import lang_id, text_quality


def test_lang_id_separates_languages(spark):
    docs = spark.createDataFrame([
        (1, "the cat sat on the mat and it was happy with that"),
        (2, "der Hund ist nicht mit der Katze auf dem Sofa"),
        (3, "el perro es una mascota que vive con la familia"),
        (4, "le chien est dans la maison pour la nuit"),
        (5, "pes je na zahradě ale byl tak unavený že spal"),
        (6, "的 了 是 在 我 有 他 这"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r["predicted_lang"] for r in lang_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "cs", 6: "zh"}


def test_quality_score_orders_garbage_below_prose(spark):
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog and then "
            "it runs away to the forest where it lives with the pack"),
        (2, "buy buy buy buy buy buy buy buy buy buy buy buy"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r for r in text_quality(docs).collect()}
    assert got[1]["quality_score"] > got[2]["quality_score"]
    assert got[2]["distinct_ratio"] < 0.2


def test_token_counts_uppercase_runs(spark):
    from kglinker.ops.textstats import token_counts
    docs = spark.createDataFrame([(1, "NASA launched APOLLO in 1969")],
                                 "doc_id long, text string")
    row = token_counts(docs).collect()[0]
    assert row["alnum_tokens"] == 5


def test_repetition_stats_crafted(spark):
    """dup/top-gram fractions on crafted docs: a pure repetition, a
    no-repeat doc, and a 1-token doc (no bigrams → zero row survives the
    left join)."""
    from kglinker.ops.textstats import repetition_stats
    rows = [
        (0, "spam spam spam spam spam", "en", "web", 0),    # 4 bigrams, 1 distinct
        (1, "a b c d e", "en", "web", 0),                   # 4 bigrams, all distinct
        (2, "solo", "en", "web", 0),                        # no bigrams
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    got = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    assert got[0]["n_grams"] == 4 and got[0]["n_distinct"] == 1
    assert got[0]["dup_gram_frac"] == 0.75 and got[0]["top_gram_frac"] == 1.0
    assert got[1]["dup_gram_frac"] == 0.0 and got[1]["top_gram_frac"] == 0.25
    assert got[2]["n_grams"] == 0 and got[2]["dup_gram_frac"] == 0.0
