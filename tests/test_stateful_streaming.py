"""applyInPandasWithState: whole-conversation semantics across
micro-batches — a pronoun arriving in a later batch must resolve against
its antecedent from an earlier batch (impossible with per-batch
extraction)."""

from __future__ import annotations

import time
from datetime import datetime

from kglinker.data.transcripts import TRANSCRIPTS_SCHEMA


def _write(spark, path, rows):
    spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA) \
        .write.mode("append").parquet(path)


def test_cross_batch_pronoun_coref(spark, artifacts_bcast, tmp_path):
    from kglinker.streaming.stateful import stateful_extract_mentions
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    ts = datetime(2025, 1, 1)
    _write(spark, inp, [("conv_x", 0, "user",
                         "Marie Curie visited Praha .", None, ts)])
    # idle timeout must exceed the inter-batch write gap, else the
    # conversation is emitted early and the test races (by design: the
    # timeout IS the conversation-end marker)
    q = stateful_extract_mentions(spark, inp, out, ckpt, artifacts_bcast,
                                  idle_timeout_ms=15000)
    try:
        # let batch 1 be absorbed into state, then ship the pronoun turn
        time.sleep(3)
        _write(spark, inp, [("conv_x", 1, "assistant",
                             "later ona moved to Germany .", None, ts)])
        # wait for idle timeout + emission
        deadline = time.time() + 180
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(out).collect()
            except Exception:
                rows = []
            if rows:
                break
            time.sleep(2)
    finally:
        q.stop()
    got = {(r["turn_idx"], r["mention_type"], r["surface"], r["kb_id"])
           for r in rows}
    assert (0, "kb", "Marie Curie", 8) in got
    assert (1, "coref", "ona", 8) in got, got   # cross-batch antecedent
    assert (1, "kb", "Germany", 17) in got