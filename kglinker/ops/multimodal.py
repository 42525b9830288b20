"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schema, partition-preserving ``mapInPandas``
decode, Arrow batch shape — is real and tested; the actual media decode is
STUBBED (this container has no image/audio libs): ``decode_media`` either
raises ``NotImplementedError`` (default) or produces a deterministic fake
(md5-derived dimensions) so downstream plumbing can be exercised.

At 100 TB: binary payloads dominate row size → keep them in their own
column family (parquet: large row groups, no dictionary), never shuffle
them (derive features first, join features later), and size
``spark.sql.execution.arrow.maxRecordsPerBatch`` down so a batch of blobs
fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_blob", "media_metadata", "decode_media"]

DECODED_SCHEMA = ("doc_id long, mime string, n_bytes int, width int, "
                  "height int, feature_hash string")


def attach_blob(docs: DataFrame) -> DataFrame:
    """Simulate a media column: text → binary payload + mime metadata.
    (Stand-in for reading real blobs; the column type and everything
    downstream is what a real pipeline uses.)"""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.lit("image/fake").alias("mime"))


def media_metadata(docs_with_blob: DataFrame) -> DataFrame:
    """(doc_id, mime, n_bytes): pure-Column metadata extraction —
    no decode, no Python."""
    return docs_with_blob.select(
        "doc_id", "mime",
        F.octet_length("blob").cast("int").alias("n_bytes"))


def decode_media(docs_with_blob: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched decode / feature-extract over ``mapInPandas``.

    ``fake=False`` raises ``NotImplementedError`` at task time (the decode
    kernel needs PIL/ffmpeg, absent here). ``fake=True`` emits
    deterministic md5-derived dimensions + a feature hash, exercising the
    real batch shape: one pandas batch in → one feature frame out,
    blob column dropped on output (features only cross the shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg; not available in this "
                    "container — run with fake=True for plumbing tests")
            h = [hashlib.md5(bytes(b)).hexdigest() for b in pdf["blob"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": [len(bytes(b)) for b in pdf["blob"]],
                "width": [1 + int(x[:4], 16) % 512 for x in h],
                "height": [1 + int(x[4:8], 16) % 512 for x in h],
                "feature_hash": h,
            })

    return docs_with_blob.mapInPandas(run, DECODED_SCHEMA)
