"""Structured Streaming ingestion of new conversations (SURVEY §2.9).

The reference's closest artifact is daemon mode — documents streamed over
stdin against resident KB state (``/root/reference/ner_cz.py:1718-1737``).
The Spark-native equivalent: ``readStream`` over the transcripts table →
watermarked dedup of late re-sent turns → ``foreachBatch`` running the
*same* batch extraction stage (one code path for batch and streaming) →
append to the mentions table.

Semantics note: extraction is per-conversation; a conversation split
across micro-batches is annotated per fragment. This matches the intended
use (a conversation is ingested atomically once it ends); no event-time
windowed aggregation is semantically required by the reference (SURVEY
§2.9), the watermark exists purely to bound the dedup state store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from kglinker.data.transcripts import TRANSCRIPTS_SCHEMA
from kglinker.extract.stage import extract_mentions

__all__ = ["stream_extract_mentions"]


def stream_extract_mentions(spark: SparkSession, input_path: str,
                            output_path: str, checkpoint_path: str,
                            artifacts_bcast,
                            available_now: bool = True) -> StreamingQuery:
    """Start (or drain, with ``available_now``) the streaming extraction.

    ``input_path``: directory new transcript parquet files land in (the
    Iceberg streaming-read equivalent); ``checkpoint_path`` carries both
    source offsets and the dedup state store → exactly-once appends."""
    stream = (spark.readStream
              .schema(TRANSCRIPTS_SCHEMA)
              .parquet(input_path)
              .withWatermark("ts", "1 hour")
              .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"]))

    def sink(batch_df, batch_id: int) -> None:
        out = extract_mentions(batch_df, artifacts_bcast)
        out.write.mode("append").parquet(output_path)

    writer = (stream.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
