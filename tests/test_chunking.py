"""Chunking + packing edge semantics (ops/chunking.py)."""

from __future__ import annotations

import pytest

from kglinker.ops.chunking import chunk_documents, pack_documents


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")


def test_chunk_windows_and_overlap(spark):
    # 10 tokens, chunk 4, overlap 1 → stride 3 → ceil((10−1)/3) = 3
    # windows [0,4) [3,7) [6,10): full coverage, no redundant tail
    toks = [f"t{i}" for i in range(10)]
    docs = _docs(spark, [(1, " ".join(toks), "en", "web", 0)])
    got = {r["chunk_idx"]: (r["chunk_text"], r["n_chunk_tokens"])
           for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()}
    assert got == {
        0: ("t0 t1 t2 t3", 4),
        1: ("t3 t4 t5 t6", 4),
        2: ("t6 t7 t8 t9", 4),
    }
    # consecutive chunks share exactly `overlap` tokens; every token of
    # the document appears in some chunk
    assert got[0][0].split()[-1] == got[1][0].split()[0]
    covered = {t for _, (text, _) in got.items() for t in text.split()}
    assert covered == set(toks)


def test_chunk_short_and_exact_docs(spark):
    docs = _docs(spark, [(1, "a b", "en", "web", 0),          # < chunk
                         (2, "a b c d", "en", "web", 0)])     # == chunk
    got = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == 2
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 4


def test_chunk_rejects_bad_overlap(spark):
    docs = _docs(spark, [(1, "a b", "en", "web", 0)])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_packing_running_layout(spark):
    # one group, ONE shard (isolate the packing arithmetic); token
    # counts 3, 4, 2 under seq budget 5:
    # starts 0, 3, 7 → seq/offset (0,0), (0,3), (1,2)
    docs = _docs(spark, [(1, "a b c", "en", "web", 0),
                         (2, "d e f g", "en", "web", 0),
                         (3, "h i", "en", "web", 0)])
    got = {r["doc_id"]: (r["seq_idx"], r["seq_offset"])
           for r in pack_documents(docs, seq_tokens=5, n_shards=1).collect()}
    assert got == {1: (0, 0), 2: (0, 3), 3: (1, 2)}


def test_packing_non_power_of_two_budget(spark):
    # seq_tokens=3 (not a power of two) exercises the integer `div`
    # path (r4 advice: double division is exact only for 2^k budgets):
    # starts 0, 3, 7 → (0,0), (1,0), (2,1)
    docs = _docs(spark, [(1, "a b c", "en", "web", 0),
                         (2, "d e f g", "en", "web", 0),
                         (3, "h i", "en", "web", 0)])
    got = {r["doc_id"]: (r["seq_idx"], r["seq_offset"])
           for r in pack_documents(docs, seq_tokens=3, n_shards=1).collect()}
    assert got == {1: (0, 0), 2: (1, 0), 3: (2, 1)}


def test_packing_groups_independent(spark):
    docs = _docs(spark, [(1, "a b c", "en", "web", 0),
                         (2, "d e", "de", "web", 0)])
    got = {r["doc_id"]: (r["seq_idx"], r["seq_offset"])
           for r in pack_documents(docs, seq_tokens=5, n_shards=1).collect()}
    # each (source, lang) group restarts at sequence 0
    assert got == {1: (0, 0), 2: (0, 0)}


def test_packing_shards_bound_hot_stratum(spark):
    # single-stratum corpus (the 100 TB web/en shape): every doc in ONE
    # (source, lang) group. With sharding, no running-sum window
    # partition holds more than ~2× the fair share, each shard restarts
    # numbering at 0, and the per-shard layout is contiguous.
    n, shards = 400, 8
    docs = _docs(spark, [(i, "w x y z", "en", "web", 0) for i in range(n)])
    rows = pack_documents(docs, seq_tokens=8, n_shards=shards).collect()
    per_shard: dict[int, list] = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r)
    assert set(per_shard) <= set(range(shards))
    assert max(len(v) for v in per_shard.values()) <= 2 * n / shards
    for rs in per_shard.values():
        rs.sort(key=lambda r: r["doc_id"])
        # contiguous concat layout within the shard: starts advance by
        # n_tokens, numbering begins at sequence 0 offset 0
        assert (rs[0]["seq_idx"], rs[0]["seq_offset"]) == (0, 0)
        start = 0
        for r in rs:
            assert (r["seq_idx"], r["seq_offset"]) == (start // 8, start % 8)
            start += r["n_tokens"]
