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
    os.remove(os.path.join(state, "_applied_batches.json"))
    q2 = stream_dedup_documents(spark, inp, state, str(tmp_path / "ck2"))
    q2.awaitTermination()
    st = read_dedup_state(spark, state)
    assert st.count() == 2
    assert st.count() == st.select("text_hash").distinct().count()
