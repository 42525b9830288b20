"""Scale-honest evidence for the registered minhash-LSH parameters
(r3 verdict demand #2): at the REGISTERED 64-hash / 16-band configuration
(kglinker/queries.py _MINHASH_N/_MINHASH_BANDS), near-dup recall vs the
exact n-gram Jaccard must be ≥0.9 at Jaccard ≥0.7.

The committed documents fixture has few strong near-dup pairs, so this
gate synthesizes a deterministic corpus WITH planted near-duplicates:
base token sequences (md5-derived vocabulary draws, no RNG), each cloned
with a handful of token substitutions so clone pairs sit at shingle-
Jaccard ≥0.7 while cross-base pairs stay near 0.

Also pins: est_sim resolution is 1/64 at the registered hash count (the
8-hash quarter-step coarseness the r3 verdict flagged is gone), and the
band join never degenerates to all-pairs on unrelated docs.
"""

from __future__ import annotations

import hashlib

from kglinker.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from kglinker.queries import _MINHASH_BANDS, _MINHASH_N

N_BASE = 40
CLONES = 2
DOC_TOKENS = 60


def _word(tag: str) -> str:
    return "w" + hashlib.md5(tag.encode()).hexdigest()[:6]


def _corpus() -> list[tuple[int, str]]:
    rows = []
    did = 0
    for b in range(N_BASE):
        base = [_word(f"base:{b}:{t}") for t in range(DOC_TOKENS)]
        rows.append((did, " ".join(base)))
        did += 1
        for c in range(CLONES):
            toks = list(base)
            # substitute 3 spread-out tokens → 9 of 58 trigram shingles
            # change → Jaccard = 49/67 ≈ 0.73 (above the 0.7 gate line)
            for i in range(3):
                pos = 7 + i * 17
                toks[pos] = _word(f"sub:{b}:{c}:{i}")
            rows.append((did, " ".join(toks)))
            did += 1
    return rows


def _docs(spark):
    rows = [(i, t, "en", "web", len(t)) for i, t in _corpus()]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")


def test_minhash_lsh_recall_at_registered_params(spark):
    docs = _docs(spark).cache()
    truth = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.7).collect()}
    assert len(truth) >= N_BASE * CLONES, "fixture must plant near-dups"

    got = {(r["doc_a"], r["doc_b"]) for r in
           minhash_lsh_pairs(docs, num_hashes=_MINHASH_N,
                             bands=_MINHASH_BANDS, min_est=0.5).collect()}
    recall = len(got & set(truth)) / len(truth)
    assert recall >= 0.9, \
        f"recall {recall:.3f} at {_MINHASH_N} hashes / {_MINHASH_BANDS} bands"


def test_minhash_est_resolution(spark):
    """est_sim granularity must be 1/_MINHASH_N (≤1/64 — the r3 demand):
    every emitted estimate times N is an integer match count."""
    docs = _docs(spark)
    ests = [r["est_sim"] for r in
            minhash_lsh_pairs(docs, num_hashes=_MINHASH_N,
                              bands=_MINHASH_BANDS, min_est=0.5).collect()]
    assert ests, "gate fixture must produce candidate pairs"
    assert _MINHASH_N >= 64
    # est_sim is fround-ed to 4 dp, so ×N recovers the integer match
    # count only up to the rounding quantum (N × 1e-4)
    for e in ests:
        scaled = e * _MINHASH_N
        assert abs(scaled - round(scaled)) < _MINHASH_N * 1e-4 + 1e-9, e


def test_minhash_bands_never_all_pairs(spark):
    """Unrelated docs (distinct vocabularies) must almost never collide
    in any band: the candidate join prunes, it does not enumerate."""
    rows = [(i, " ".join(_word(f"solo:{i}:{t}") for t in range(DOC_TOKENS)),
             "en", "web", 0) for i in range(80)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    got = minhash_lsh_pairs(docs, num_hashes=_MINHASH_N,
                            bands=_MINHASH_BANDS, min_est=0.0).count()
    all_pairs = 80 * 79 // 2
    assert got < 0.05 * all_pairs, (got, all_pairs)


def test_minhash_lsh_pairs_releases_signature_cache(spark):
    """Cache lifecycle (r4 advice): repeated calls in one session must
    not accumulate cached signature tables. Each call may retain its
    own localCheckpoint'ed RESULT (freed when the DataFrame is GC'd),
    so growth is bounded by one persisted RDD per call — the r4 code
    left a cached 64-column signature table per call on top of that."""
    rows = [(i, " ".join(_word(f"lc:{i}:{t}") for t in range(20)),
             "en", "web", 0) for i in range(30)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    outs = []
    for _ in range(3):
        out = minhash_lsh_pairs(docs, num_hashes=8, bands=4, min_est=0.0)
        out.count()
        outs.append(out)
    grown = jsc.getPersistentRDDs().size() - base
    assert grown <= 3, f"leaked {grown} persisted RDDs over 3 calls"
