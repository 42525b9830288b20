"""Hot-block guards on the quadratic exact verifiers (r5 verdict #3):
a pathological corpus where ONE block is (nearly) all rows must complete
through the banded candidate route with a bounded pair space — precision
stays exact (routed output ⊆ exact output), and high-similarity pairs
are still recovered."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kglinker.ops.dedup import ngram_jaccard_pairs
from kglinker.ops.similarity import cosine_pairs_same_label


def _hot_docs(spark, n=60):
    # one giant ("web","en") block: near-dup families of 3 + unique docs
    rows = []
    for i in range(n):
        fam, variant = divmod(i, 3)
        base = [f"tok{fam}_{j}" for j in range(30)]
        if fam % 2 == 0:
            # family of near-identical docs (1-token edit per variant)
            if variant:
                base[variant] = f"edit{variant}"
        else:
            # unique docs: fully distinct token streams
            base = [f"u{i}_{j}" for j in range(30)]
        rows.append((i, " ".join(base), "en", "web", 0))
    rows.append((n, "completely different cold block text " * 3, "de",
                 "books", 0))
    rows.append((n + 1, "completely different cold block text " * 3, "de",
                 "books", 0))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")


def test_ngram_jaccard_hot_block_routed(spark):
    docs = _hot_docs(spark)
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, max_block_rows=None).collect()}
    guarded = {(r["doc_a"], r["doc_b"]): r["jaccard"]
               for r in ngram_jaccard_pairs(docs, max_block_rows=20).collect()}
    # precision exact: every routed pair is a true pair with the true value
    assert set(guarded) <= set(exact)
    assert all(exact[k] == v for k, v in guarded.items())
    # the cold block is still served by the exact path
    cold = {k for k in exact if k[0] >= 60}
    assert cold and cold <= set(guarded)
    # high-jaccard family pairs survive the banded route (recall on the
    # pairs that matter: 1-token edits at 30 tokens ≈ jaccard ~0.87)
    strong = {k for k, v in exact.items() if v >= 0.8}
    assert strong and strong <= set(guarded)


def _hot_emb(spark, n=40, dim=16):
    def vec(seed, flip=0):
        out = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
            out.append(int(h[:8], 16) / float(0xFFFFFFFF) - 0.5)
        if flip:
            out[flip] = -out[flip]
        return out

    rows = []
    for i in range(n):
        fam, variant = divmod(i, 2)
        if fam % 2 == 0:
            rows.append((i, vec(f"fam{fam}", flip=variant), "hotlabel"))
        else:
            rows.append((i, vec(f"uniq{i}"), "hotlabel"))
    rows.append((n, vec("cold0"), "cold"))
    rows.append((n + 1, vec("cold0"), "cold"))
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>, label string")


def test_cosine_pairs_hot_label_routed(spark):
    emb = _hot_emb(spark)
    exact = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
             for r in cosine_pairs_same_label(
                 emb, threshold=0.8, max_block_rows=None).collect()}
    guarded = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
               for r in cosine_pairs_same_label(
                   emb, threshold=0.8, max_block_rows=10).collect()}
    assert set(guarded) <= set(exact)
    assert all(exact[k] == v for k, v in guarded.items())
    # cold label still exact
    assert (40, 41) in guarded
    # near-identical (one sign flip) family pairs recovered by the route
    strong = {k for k, v in exact.items() if v >= 0.9}
    assert strong and strong <= set(guarded)


def test_ngram_jaccard_null_lang_hot_block(spark):
    """r6 review: a hot block keyed (source, NULL) — failed lang
    detection — must not poison the routing predicate into NULL and
    silently drop every same-source doc from both paths."""
    rows = ([(i, "a b c d e f g h", None, "web", 0) for i in range(30)]
            + [(100, "a b c d e f g h", "en", "web", 0),
               (101, "a b c d e f g h", "en", "web", 0)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    got = {(r["doc_a"], r["doc_b"])
           for r in ngram_jaccard_pairs(docs, max_block_rows=10).collect()}
    # the cold ("web","en") pair survives the exact path
    assert (100, 101) in got
    # identical docs inside the routed NULL-lang hot block are found
    assert (0, 1) in got


def test_precomputed_block_counts_skip_detection_scan(spark):
    """block_counts (e.g. from corpus_profile) must drive routing
    identically to the internal detection scan."""
    docs = _hot_docs(spark)
    sizes = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"))
    a = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
         ngram_jaccard_pairs(docs, max_block_rows=20).collect()}
    b = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
         ngram_jaccard_pairs(docs, max_block_rows=20,
                             block_counts=sizes).collect()}
    assert a == b and a
    emb = _hot_emb(spark)
    esizes = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs"))
    c = {(r["vec_a"], r["vec_b"]) for r in cosine_pairs_same_label(
        emb, threshold=0.8, max_block_rows=10).collect()}
    d = {(r["vec_a"], r["vec_b"]) for r in cosine_pairs_same_label(
        emb, threshold=0.8, max_block_rows=10,
        block_counts=esizes).collect()}
    assert c == d and c
