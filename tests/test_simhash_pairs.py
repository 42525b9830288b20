"""simhash Hamming-k pairing (r2 verdict demand #3): block-banded
candidate generation must find EXACTLY the pairs within Hamming distance
k — the pigeonhole argument (a pair at distance ≤ k agrees on ≥1 of the
k+1 blocks) makes the banding lossless, so the operator equals the
brute-force over signatures, never approximates it."""

from __future__ import annotations

import pytest

from kglinker.ops.dedup import simhash_pairs, simhash_signatures


def _docs(spark):
    # near-duplicate family (token edits) + unrelated docs
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "web", 0),
        (1, "the quick brown fox jumps over the lazy cat", "en", "web", 0),
        (2, "the quick brown fox leaps over the lazy dog", "en", "web", 0),
        (3, "completely different text about spark partitioning", "en", "web", 0),
        (4, "another unrelated document on knowledge graphs", "en", "web", 0),
        (5, "the quick brown fox jumps over the lazy dog", "en", "web", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")


def _ham(a: int, b: int) -> int:
    # signatures are signed 64-bit (bit 63 = sign bit): mask the XOR to the
    # two's-complement bit pattern before popcount
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.mark.parametrize("bits,k", [(16, 3), (16, 2), (24, 3),
                                    (64, 3), (40, 3)])
def test_simhash_pairs_equal_bruteforce(spark, bits, k):
    docs = _docs(spark)
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, bits).collect()}
    ids = sorted(sigs)
    truth = {(a, b, _ham(sigs[a], sigs[b]))
             for i, a in enumerate(ids) for b in ids[i + 1:]
             if _ham(sigs[a], sigs[b]) <= k}
    got = {(r["doc_a"], r["doc_b"], r["hamming"])
           for r in simhash_pairs(docs, bits, k).collect()}
    assert got == truth
    if k >= 2:
        # the doc-5 exact copy of doc 0 must pair at distance 0
        assert (0, 5, 0) in got


def test_simhash_64bit_uses_sign_bit(spark):
    """The 64-bit sha2 path must populate bit 63 (negative signatures) on
    at least some docs, and Spark/DuckDB must agree bit-for-bit — the
    production width is only real if the sign bit actually carries data."""
    import duckdb
    docs = _docs(spark)
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, 64).collect()}
    assert any(s < 0 for s in sigs.values()), \
        "no signature uses bit 63 — width is not really 64"
    from kglinker.queries import _sql_simbits, _sql_votes
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    h AS (SELECT doc_id, sha256(tok) AS h FROM toks),
    v AS (SELECT doc_id, {_sql_votes(64)} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({_sql_simbits(64)} AS BIGINT) AS simhash FROM v"""
    duck = {int(r[0]): int(r[1]) for r in con.sql(sql).fetchall()}
    assert duck == sigs


def test_simhash_pairs_block_cover_with_remainder(spark):
    """bits not divisible by k+1: remainder bits must still be covered by
    exactly one block (no bit dropped → pigeonhole still holds)."""
    docs = _docs(spark)
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, 18).collect()}
    ids = sorted(sigs)
    truth = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
             if bin(sigs[a] ^ sigs[b]).count("1") <= 3}
    got = {(r["doc_a"], r["doc_b"])
           for r in simhash_pairs(docs, 18, 3).collect()}
    assert got == truth


def test_simhash_null_text_dropped(spark):
    """r5 ADVICE: the in-row rewrite must keep the pre-r5 emitted row set —
    a NULL-text doc is dropped (as the explode/groupBy plan and the DuckDB
    oracle do), not emitted with a NULL signature that would leak into
    downstream bitwiseXOR."""
    rows = [(0, "the quick brown fox", "en", "web", 0),
            (1, None, "en", "web", 0)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    got = simhash_signatures(docs, bits=64).collect()
    assert [r["doc_id"] for r in got] == [0]
    assert all(r["simhash"] is not None for r in got)


@pytest.mark.parametrize("bits,k,nb", [(64, 3, 6), (64, 3, 5), (64, 2, 6),
                                       (16, 3, 8), (64, 1, 4)])
def test_simhash_combination_scheme_equal_bruteforce(spark, bits, k, nb):
    """r6: the Manku block-combination scheme (B > k+1 blocks, candidates
    agree on some (B−k)-subset) must remain LOSSLESS — identical pair set
    to brute force, hence to the classic k+1 scheme — while using C(B,B−k)
    wider keys (the collision dial for saturated corpora)."""
    docs = _docs(spark)
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs, bits).collect()}
    ids = sorted(sigs)
    truth = {(a, b, _ham(sigs[a], sigs[b]))
             for i, a in enumerate(ids) for b in ids[i + 1:]
             if _ham(sigs[a], sigs[b]) <= k}
    got = {(r["doc_a"], r["doc_b"], r["hamming"])
           for r in simhash_pairs(docs, bits, k, n_blocks=nb).collect()}
    assert got == truth


def test_simhash_combination_scheme_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="k\\+1"):
        simhash_pairs(docs, 64, 3, n_blocks=3)
    with pytest.raises(ValueError, match="exceeds"):
        simhash_pairs(docs, 16, 3, n_blocks=17)
