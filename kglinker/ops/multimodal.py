"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schema, partition-preserving ``mapInPandas``
decode, Arrow batch shape — is real and tested. Decode kernels:

- **PPM (P6)** decodes FOR REAL (pure-python header+pixel parser, no
  external libs): true width/height and an md5 feature hash over the
  pixel payload.
- JPEG/PNG/audio/video need PIL/ffmpeg (absent in this container):
  ``decode_media`` raises ``NotImplementedError`` for those formats
  (default) or produces a deterministic fake (md5-derived dimensions)
  with ``fake=True`` so downstream plumbing can be exercised.

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

__all__ = ["attach_blob", "media_metadata", "decode_media", "frame_sample",
           "synth_ppm",
           "resize_features"]

DECODED_SCHEMA = ("doc_id long, mime string, n_bytes int, width int, "
                  "height int, feature_hash string")


def synth_ppm(seed: int, width: int, height: int) -> bytes:
    """Deterministic P6 PPM image (test/bench data, no RNG)."""
    header = f"P6\n{width} {height}\n255\n".encode()
    px = bytearray()
    for i in range(width * height):
        d = hashlib.md5(f"{seed}:{i}".encode()).digest()
        px += d[:3]
    return header + bytes(px)


def _decode_ppm(b: bytes) -> tuple[int, int, str]:
    """(width, height, feature_hash) from a binary P6 PPM — pure python.
    Handles '#' comments and arbitrary whitespace in the header."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            while pos < len(b) and b[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1   # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    pixels = b[pos:pos + 3 * width * height]
    if len(pixels) != 3 * width * height:
        raise ValueError("truncated PPM pixel payload")
    return width, height, hashlib.md5(pixels).hexdigest()


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

    ``fake=False`` decodes P6 PPM blobs natively (pure python) and raises
    ``NotImplementedError`` at task time for formats that need PIL/ffmpeg
    (absent here). ``fake=True`` emits deterministic md5-derived
    dimensions + a feature hash, exercising the real batch shape: one
    pandas batch in → one feature frame out, blob column dropped on
    output (features only cross the shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                rows = []
                for doc_id, mime, blob in zip(pdf["doc_id"], pdf["mime"],
                                              pdf["blob"]):
                    b = bytes(blob)
                    if b.startswith(b"P6"):
                        w, hgt, fh = _decode_ppm(b)
                        rows.append((int(doc_id), "image/x-portable-pixmap",
                                     len(b), w, hgt, fh))
                    else:
                        raise NotImplementedError(
                            f"media decode for {mime!r} requires PIL/ffmpeg "
                            "(absent in this container); PPM decodes "
                            "natively, or run with fake=True")
                yield pd.DataFrame(rows, columns=[
                    "doc_id", "mime", "n_bytes", "width", "height",
                    "feature_hash"])
                continue
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


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_hash string, offset_bytes int"


def frame_sample(docs_with_blob: DataFrame, every_n_bytes: int = 64,
                 fake: bool = True) -> DataFrame:
    """Video-style frame sampling: one row per sampled frame (1→N fan-out
    inside ``mapInPandas`` — the batch shape a real ffmpeg key-frame
    sampler uses; the decode kernel itself is the deterministic fake)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("frame decode requires ffmpeg")
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                for k, off in enumerate(range(0, len(b), every_n_bytes)):
                    chunk = b[off:off + every_n_bytes]
                    rows.append((int(doc_id), k,
                                 hashlib.md5(chunk).hexdigest(), off))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "frame_hash", "offset_bytes"])

    return docs_with_blob.mapInPandas(run, FRAME_SCHEMA)


def resize_features(decoded: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize step over decoded metadata: pure Column math on (width,
    height) — the aspect-preserving target shape a real resize kernel
    would use; no Python needed because only metadata is transformed."""
    scale = F.least(F.lit(float(max_dim)) / F.col("width"),
                    F.lit(float(max_dim)) / F.col("height"),
                    F.lit(1.0))
    return decoded.select(
        "doc_id", "feature_hash",
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"))
