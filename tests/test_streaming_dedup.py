"""Streaming exact dedup: first-seen content is admitted once across
micro-batches, survivors match the batch-mode rule (min doc_id), and the
merge is idempotent under replay because the state itself filters."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kglinker.streaming.dedup import (DOCS_SCHEMA, read_dedup_state,
                                      stream_dedup_documents)


def _write_batch(spark, path, rows, name):
    import glob
    import shutil
    tmp = os.path.join(path, f"_stage_{name}")
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
        shutil.move(f, os.path.join(path, f"{name}_{i}.parquet"))
    shutil.rmtree(tmp)


def _doc(i, text):
    return (i, text, "en", "web", len(text))


def test_stream_dedup_first_seen_wins(spark, tmp_path):
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "st", "ck"))
    os.makedirs(inp)

    # batch 1: a within-batch duplicate (docs 1/5 same text) + uniques
    _write_batch(spark, inp,
                 [_doc(1, "alpha beta"), _doc(5, "alpha beta"),
                  _doc(2, "gamma delta")], "b1")
    q = stream_dedup_documents(spark, inp, state, ckpt)
    q.awaitTermination()
    s1 = {r["doc_id"]: r["text_hash"]
          for r in read_dedup_state(spark, state).collect()}
    assert sorted(s1) == [1, 2]          # min-doc_id survivor, dup dropped

    # batch 2: replays batch-1 content under new ids + one new doc
    _write_batch(spark, inp,
                 [_doc(9, "alpha beta"), _doc(10, "gamma delta"),
                  _doc(11, "epsilon zeta")], "b2")
    q2 = stream_dedup_documents(spark, inp, state, ckpt)
    q2.awaitTermination()
    st = read_dedup_state(spark, state)
    assert sorted(r["doc_id"] for r in st.collect()) == [1, 2, 11]
    # hashes unique in state
    assert st.count() == st.select("text_hash").distinct().count()

    # re-run with no new files: state unchanged (checkpoint + marker)
    q3 = stream_dedup_documents(spark, inp, state, ckpt)
    q3.awaitTermination()
    assert sorted(r["doc_id"]
                  for r in read_dedup_state(spark, state).collect()) == [1, 2, 11]


def test_stream_dedup_merge_idempotent_without_marker(spark, tmp_path):
    """The anti-join makes the merge itself idempotent: re-appending the
    SAME batch against the state admits nothing (unlike the edge-weight
    merge, which needs the batch-id guard)."""
    inp, state, ckpt = (str(tmp_path / d) for d in ("in", "st", "ck"))
    os.makedirs(inp)
    _write_batch(spark, inp, [_doc(1, "one two"), _doc(2, "three four")],
                 "b1")
    q = stream_dedup_documents(spark, inp, state, ckpt)
    q.awaitTermination()
    # simulate a replay that lost the marker: clear applied-batch state
    os.remove(os.path.join(state, "_applied_batches_docs.json"))
    q2 = stream_dedup_documents(spark, inp, state, str(tmp_path / "ck2"))
    q2.awaitTermination()
    st = read_dedup_state(spark, state)
    assert st.count() == 2
    assert st.count() == st.select("text_hash").distinct().count()


def test_stream_neardup_admission(spark, tmp_path):
    """Streaming near-dup: an arriving document whose minhash-estimated
    Jaccard vs an admitted doc reaches the threshold is dropped —
    across batches AND within a batch; unrelated docs are admitted; a
    marker-less replay admits nothing (self-idempotence via the state)."""
    import hashlib
    import os

    from kglinker.streaming.dedup import (read_neardup_state,
                                          stream_neardup_documents)

    def w(tag):
        return "w" + hashlib.md5(tag.encode()).hexdigest()[:6]

    def doc(i, words):
        text = " ".join(words)
        return (i, text, "en", "web", len(text))

    base = [w(f"b:{t}") for t in range(60)]
    other = [w(f"o:{t}") for t in range(60)]
    clone = list(base)
    for i in range(3):
        clone[7 + i * 17] = w(f"sub:{i}")   # shingle-Jaccard ≈ 0.73

    inp, state, ck = (str(tmp_path / d) for d in ("in", "st", "ck"))
    os.makedirs(inp)

    # batch 1: base + an unrelated doc + a WITHIN-batch near-dup of base
    _write_batch(spark, inp, [doc(1, base), doc(2, other), doc(3, clone)],
                 "b1")
    stream_neardup_documents(spark, inp, state, ck).awaitTermination()
    assert sorted(r["doc_id"] for r in
                  read_neardup_state(spark, state).collect()) == [1, 2]

    # batch 2: a cross-batch clone of doc 1 + a genuinely new doc
    fresh = [w(f"f:{t}") for t in range(60)]
    _write_batch(spark, inp, [doc(10, clone), doc(11, fresh)], "b2")
    stream_neardup_documents(spark, inp, state, ck).awaitTermination()
    assert sorted(r["doc_id"] for r in
                  read_neardup_state(spark, state).collect()) == [1, 2, 11]

    # marker-less replay of everything: self-collisions admit nothing
    os.remove(os.path.join(state, "_applied_batches_sigs.json"))
    stream_neardup_documents(spark, inp, state,
                             str(tmp_path / "ck2")).awaitTermination()
    assert sorted(r["doc_id"] for r in
                  read_neardup_state(spark, state).collect()) == [1, 2, 11]


def test_stream_neardup_short_docs_exact_channel(spark, tmp_path):
    """Docs with <3 tokens can't shingle; they must flow through the
    exact-dup channel instead of vanishing (r4 review fix): distinct
    short docs are admitted, identical short content is dropped across
    batches."""
    import os

    from kglinker.streaming.dedup import (read_neardup_state,
                                          stream_neardup_documents)
    inp, state, ck = (str(tmp_path / d) for d in ("in", "st", "ck"))
    os.makedirs(inp)
    _write_batch(spark, inp, [(1, "ok", "en", "web", 2),
                              (2, "hi there", "en", "web", 8)], "b1")
    stream_neardup_documents(spark, inp, state, ck).awaitTermination()
    assert sorted(r["doc_id"] for r in
                  read_neardup_state(spark, state).collect()) == [1, 2]

    # batch 2: exact copy of doc 1's text + a new short doc
    _write_batch(spark, inp, [(9, "ok", "en", "web", 2),
                              (10, "fine", "en", "web", 4)], "b2")
    stream_neardup_documents(spark, inp, state, ck).awaitTermination()
    assert sorted(r["doc_id"] for r in
                  read_neardup_state(spark, state).collect()) == [1, 2, 10]


def test_stream_neardup_dead_signatures_recover_closure(spark, tmp_path):
    """Closure mode (r5): with keep_dead_signatures=True a doc similar
    ONLY to a batch-killed doc is itself killed (the batch CC would
    have folded it into the cluster); with the default it is admitted —
    the documented approximation. Texts crafted so the REAL sha256
    minhash at 128 hashes / 16 bands yields est(A,B)=0.789,
    est(B,C)=0.734 (both collide in ≥1 band) but est(A,C)=0.563 with NO
    band collision — deterministic, hash functions are fixed."""
    from kglinker.streaming.dedup import (read_neardup_state,
                                          stream_neardup_documents)
    W = [f"w{i:02d}" for i in range(60)]
    A = " ".join(W)
    B = " ".join([f"b{i:02d}" for i in range(6)] + W[6:])
    C = " ".join([f"b{i:02d}" for i in range(6)] + W[6:48]
                 + [f"c{i:02d}" for i in range(12)])
    params = dict(num_hashes=128, bands=16, min_est=0.65)

    for mode, expect in ((False, [1, 10]), (True, [1])):
        inp, state, ckpt = (str(tmp_path / f"{d}{mode}")
                            for d in ("in", "st", "ck"))
        os.makedirs(inp)
        _write_batch(spark, inp, [_doc(1, A), _doc(2, B)], "b1")
        stream_neardup_documents(spark, inp, state, ckpt,
                                 keep_dead_signatures=mode,
                                 **params).awaitTermination()
        # B collides with A in-batch and dies in BOTH modes
        assert sorted(r["doc_id"] for r in
                      read_neardup_state(spark, state).collect()) == [1]
        _write_batch(spark, inp, [_doc(10, C)], "b2")
        stream_neardup_documents(spark, inp, state, ckpt,
                                 keep_dead_signatures=mode,
                                 **params).awaitTermination()
        got = sorted(r["doc_id"] for r in
                     read_neardup_state(spark, state).collect())
        assert got == expect, (mode, got)
        # marker-less replay (reset checkpoint, keep state): every doc
        # self-collides with its own state rows; admitted set AND state
        # size must not change — in closure mode the replayed batch must
        # NOT be re-appended as dead rows (r5 review fix)
        n_rows = spark.read.parquet(os.path.join(state, "sigs")).count()
        os.remove(os.path.join(state, "_applied_batches_sigs.json"))
        stream_neardup_documents(spark, inp, state, str(tmp_path / f"ck2{mode}"),
                                 keep_dead_signatures=mode,
                                 **params).awaitTermination()
        assert sorted(r["doc_id"] for r in
                      read_neardup_state(spark, state).collect()) == expect
        assert spark.read.parquet(
            os.path.join(state, "sigs")).count() == n_rows
