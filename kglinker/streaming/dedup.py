"""Streaming exact dedup of continuously arriving documents.

Batch-mode dedup (:func:`kglinker.ops.dedup.exact_dedup_groups`) scans
the whole corpus; a training-data INGEST pipeline instead sees documents
arrive forever and must admit only first-seen content. This module keeps
a persistent seen-state (``state_path/docs`` parquet: the admitted rows
plus their ``text_hash``) and, per micro-batch inside ``foreachBatch``:

1. hash the batch (``md5(text)``) and keep the min-``doc_id`` survivor
   per hash WITHIN the batch (same survivor rule as batch dedup);
2. anti-join the survivors against the seen-state hashes (cross-batch
   dedup) — only genuinely new content appends to the state.

Idempotence is stronger than the edge-weight merge
(:mod:`kglinker.streaming.graph`): a replayed batch is filtered by the
state it already appended to — the anti-join makes the merge itself
idempotent, and the batch-id marker only short-circuits the work. On
Iceberg the append becomes ``MERGE INTO corpus USING batch ON text_hash
WHEN NOT MATCHED THEN INSERT`` and the state IS the corpus table.

Scale: the anti-join is new-batch × seen-hashes keyed by text_hash — on
a cluster, bucket the state by ``text_hash`` so each micro-batch probes
only its buckets (storage-partitioned join, no full-state shuffle); the
batch side is always the small side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from kglinker.streaming.graph import _applied, _mark_applied

__all__ = ["stream_dedup_documents", "read_dedup_state", "DOCS_SCHEMA"]

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars int")
_DOCS = "docs"


def read_dedup_state(spark: SparkSession, state_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_path, _DOCS))


def stream_dedup_documents(spark: SparkSession, input_path: str,
                           state_path: str, checkpoint_path: str,
                           available_now: bool = True) -> StreamingQuery:
    """readStream documents → per-batch within-batch survivors →
    anti-join against the seen-state → append only first-seen content."""
    os.makedirs(state_path, exist_ok=True)
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_path)

    def sink(batch_df, batch_id: int) -> None:
        if int(batch_id) in _applied(state_path):
            return
        sp = batch_df.sparkSession
        hashed = batch_df.withColumn("text_hash", F.md5("text"))
        w = Window.partitionBy("text_hash").orderBy("doc_id")
        survivors = (hashed.withColumn("_rn", F.row_number().over(w))
                     .filter(F.col("_rn") == 1).drop("_rn"))
        target = os.path.join(state_path, _DOCS)
        if os.path.exists(target):
            seen = sp.read.parquet(target).select("text_hash")
            new = survivors.join(seen, "text_hash", "left_anti")
        else:
            new = survivors
        new.write.mode("append").parquet(target)
        _mark_applied(state_path, batch_id)

    writer = (stream.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
