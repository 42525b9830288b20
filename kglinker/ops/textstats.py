"""Text analysis operators: quality scoring, language-ID heuristic, token
counting, document fingerprinting. All pure Column expressions (JVM-side,
whole-stage codegen) with exact DuckDB-SQL equivalents for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kglinker.ops.util import fround

__all__ = ["STOPWORDS", "LANG_MARKERS", "text_quality", "lang_id",
           "token_counts", "fingerprints", "word_freq_ratio",
           "repetition_stats", "logprob_quality", "corpus_profile"]

# top English function words (quality-gate stoplist)
STOPWORDS = [
    "the", "a", "an", "of", "and", "or", "to", "in", "on", "at", "is",
    "are", "was", "were", "be", "been", "it", "that", "this", "these",
    "for", "with", "as", "by", "from", "not", "but", "they", "we", "you",
    "he", "she", "his", "her", "their", "its", "have", "has", "had",
    "will", "would", "can", "could", "do", "does", "did", "if", "then",
]

# marker-word language-ID profiles: function words unique-ish per language,
# argmax of hit counts with deterministic tie order. Still a heuristic
# profile (a production system plugs fastText/CLD3 behind the same
# operator shape), but wide enough to separate the six languages on
# real running text rather than single-sentence toys.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "is", "was", "that", "with", "they",
           "have", "from", "this", "were", "which", "their"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "sich",
           "auch", "auf", "eine", "als", "wird", "dem", "den"],
    "es": ["el", "la", "los", "las", "que", "es", "una", "por", "para",
           "con", "del", "se", "su", "como", "más"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "dans", "pour",
           "qui", "pas", "sur", "au", "ce", "vous"],
    "cs": ["je", "se", "na", "že", "byl", "byla", "jsou", "ale", "jako",
           "tak", "který", "při", "pro", "jeho", "roku"],
    "zh": ["的", "了", "是", "在", "我", "有", "他", "这", "就", "不",
           "人", "都", "一个", "上", "也"],
}


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


def text_quality(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, stopword_ratio,
    distinct_ratio, quality_score): the classic pretraining quality gates
    (length / punctuation / stopword / repetition ratios)."""
    toks = _tokens()
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    avg_len = (F.length("text") - (n_tokens - 1)) / n_tokens  # chars sans separators
    stop_ratio = n_stop / n_tokens
    distinct_ratio = n_distinct / n_tokens
    quality = (F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
               + stop_ratio * 0.2 + distinct_ratio * 0.4)
    return docs.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars_calc"),
        fround(avg_len, 4).alias("avg_token_len"),
        fround(stop_ratio, 4).alias("stopword_ratio"),
        fround(distinct_ratio, 4).alias("distinct_ratio"),
        fround(quality, 4).alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang, marker_hits): argmax of marker hit counts,
    ties broken by language code order (deterministic)."""
    toks = _tokens()
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct((-hits).alias("neg_hits"),
                               F.lit(lang).alias("lang"), hits.alias("hits")))
    best = F.array_min(F.array(*scores))
    return docs.select("doc_id",
                       best["lang"].alias("predicted_lang"),
                       best["hits"].cast("int").alias("marker_hits"))


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, alnum_tokens, byte_len): whitespace tokens plus
    BPE-ish alnum-run count via regexp (the pretokenizer proxy;
    case-insensitive so uppercase runs count too)."""
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("int").alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-zA-Z0-9]+")).cast("int")
         .alias("alnum_tokens"),
        F.octet_length("text").cast("int").alias("byte_len"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): min-of-md5 over token trigrams — a
    winnowing-style content fingerprint stable under doc reordering in the
    corpus; trigrams built shuffle-free via index-aware transform."""
    from kglinker.ops.util import explode_token_ngrams
    tri = explode_token_ngrams(docs, 3, ["doc_id"]) \
        .select("doc_id", F.md5("g").alias("h"))
    return tri.groupBy("doc_id").agg(F.min("h").alias("fingerprint"))


def word_freq_ratio(docs: DataFrame) -> DataFrame:
    """(word, freq, ratio): corpus word frequency with case-insensitive
    dominance ratio — the A5 aggregation of SURVEY §2.4 (reference
    ``KB2namelist.py:533-547`` capital-dominance gate input)."""
    words = docs.select(F.explode(_tokens()).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    tot = freq.groupBy(F.lower("word").alias("lw")) \
              .agg(F.sum("freq").alias("tot"))
    return (freq.join(tot, F.lower("word") == F.col("lw"))
            .select("word", "freq", fround(F.col("freq") / F.col("tot"), 4).alias("ratio")))


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, n_grams, n_distinct, top_gram_count, dup_gram_frac,
    top_gram_frac): the RefinedWeb/Gopher-style repetition filters —
    ``dup_gram_frac`` is the fraction of token-``n``-gram OCCURRENCES that
    are repeats of an earlier occurrence (1 − distinct/total), and
    ``top_gram_frac`` the fraction claimed by the single most frequent
    n-gram. Docs with high values are boilerplate/spam candidates that
    per-doc dedup cannot catch (the repetition is INSIDE the document).

    Plan: in-row n-gram explode → one (doc_id, gram) count aggregation →
    one per-doc rollup — two map-side-combinable shuffles, no join, no
    Python. Documents with fewer than ``n`` tokens emit no n-grams and
    are reported with n_grams = 0 and zero fractions (a LEFT join from
    the doc list keeps them — short docs are exactly the rows a quality
    pipeline must still see)."""
    from kglinker.ops.util import explode_token_ngrams
    grams = explode_token_ngrams(docs, n, ["doc_id"])
    per_gram = grams.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_gram_count"))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
                F.coalesce("top_gram_count", F.lit(0))
                 .alias("top_gram_count"),
                fround(F.when(F.col("n_grams").isNull(), 0.0)
                       .otherwise(1.0 - F.col("n_distinct")
                                  / F.col("n_grams")), 4)
                .alias("dup_gram_frac"),
                fround(F.when(F.col("n_grams").isNull(), 0.0)
                       .otherwise(F.col("top_gram_count")
                                  / F.col("n_grams")), 4)
                .alias("top_gram_frac")))


def logprob_quality(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob): mean ln(unigram probability) of
    the document's tokens under the corpus's OWN unigram distribution —
    the classic perplexity-proxy quality filter (docs far below the
    corpus norm are gibberish/boilerplate candidates; far above are
    stopword soup). A production pipeline swaps the unigram model for a
    trained LM behind the same operator shape.

    Plan: one corpus-wide (token → count) aggregation joined back onto
    the exploded tokens, plus a scalar total via a 1-row cross join —
    map-side-combinable shuffles, no Python. The frequency table is
    vocabulary-sized: broadcast when it fits; at web scale (billions of
    distinct tokens) it becomes a token-keyed shuffle equijoin — still
    linear, and the natural layout is both sides bucketed by token."""
    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    return (toks.join(freq, "tok")
            .crossJoin(total)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 fround(F.avg(F.log(F.col("c") / F.col("n"))), 4)
                 .alias("avg_logprob")))


def corpus_profile(docs: DataFrame,
                   by: list[str] | None = None) -> DataFrame:
    """(by…, n_docs, n_tokens, n_chars, min_tokens, max_tokens,
    p50_tokens, p95_tokens): the one-pass per-stratum corpus profile a
    training run is planned against (mixture weights, packing budgets,
    outlier cutoffs all read off this table).

    ONE aggregation — the token count is computed in-row and every
    statistic, including the exact percentiles, rides the same
    map-side-combinable shuffle (``percentile`` keeps a per-group
    counter map, fine for token-count-valued columns); output is
    |strata| rows. ``percentile`` ≡ DuckDB ``quantile_cont``
    bit-identically (interpolation parity proven by the
    events_quantiles gate)."""
    if by is None:
        by = ["source", "lang"]
    n = F.size(F.split(F.col("text"), " "))
    return (docs.select(*by, n.alias("_nt"), F.length("text").alias("_nc"))
            .groupBy(*by)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_nt").alias("n_tokens"),
                 F.sum("_nc").alias("n_chars"),
                 F.min("_nt").alias("min_tokens"),
                 F.max("_nt").alias("max_tokens"),
                 fround(F.expr("percentile(_nt, 0.5)"), 4).alias("p50_tokens"),
                 fround(F.expr("percentile(_nt, 0.95)"), 4).alias("p95_tokens")))
