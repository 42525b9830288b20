"""Per-partition lineage + resume (north_rule: "resumable from checkpoint
with per-partition lineage + metrics").

Unit of work = a **conversation bucket**: ``bucket = pmod(xxhash64(conv_id),
n_buckets)``. Each bucket is processed as one Spark job over *all*
executors (a bucket is 1/n of the corpus, not one task), written to
``out/bucket=K/`` with an atomic directory overwrite, and marked done by a
lineage row carrying counts + wall time. A killed run resumes by
anti-joining finished buckets — zero recomputation of completed work
(SURVEY §5 idempotent-resume property).

The reference has no equivalent (its resumability is "documents are
processed one at a time from stdin", ``ner_cz.py:1718-1737``); this layer is
what the north_rule adds for 10^12-turn batch runs. On Iceberg the
per-bucket write maps to ``overwritePartitions()`` on a
``bucket(conv_id)``-partitioned table and the lineage table carries the KB
snapshot id used for the automaton.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bucket_col", "LineageCheckpointer"]


def bucket_col(n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


class LineageCheckpointer:
    """Drive a per-bucket stage with lineage markers.

    ``out_path/bucket=K/`` holds stage output per bucket (parquet);
    ``lineage_path/`` holds one small JSON marker file per finished bucket
    (atomic rename) with metrics. Marker files rather than a parquet
    append keep the commit atomic without a table format; on Iceberg this
    becomes an append to a ``_lineage`` table in the same transaction.
    """

    def __init__(self, out_path: str, lineage_path: str, n_buckets: int,
                 kb_snapshot: str = "kb-fixture-v1"):
        self.out_path = out_path
        self.lineage_path = lineage_path
        self.n_buckets = n_buckets
        self.kb_snapshot = kb_snapshot
        os.makedirs(lineage_path, exist_ok=True)

    # -- lineage ------------------------------------------------------------
    def done_buckets(self) -> set[int]:
        out = set()
        for f in os.listdir(self.lineage_path):
            if f.startswith("bucket-") and f.endswith(".json"):
                out.add(int(f[len("bucket-"):-len(".json")]))
        return out

    def lineage_records(self) -> list[dict]:
        recs = []
        for b in sorted(self.done_buckets()):
            with open(os.path.join(self.lineage_path, f"bucket-{b}.json")) as fh:
                recs.append(json.load(fh))
        return recs

    def _mark_done(self, bucket: int, metrics: dict) -> None:
        rec = {"bucket": bucket, "kb_snapshot": self.kb_snapshot, **metrics}
        tmp = os.path.join(self.lineage_path, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, os.path.join(self.lineage_path, f"bucket-{bucket}.json"))

    # -- execution ----------------------------------------------------------
    def run(self, transcripts: DataFrame,
            stage: Callable[[DataFrame], DataFrame],
            max_buckets: int | None = None) -> list[int]:
        """Process every not-yet-done bucket; returns buckets processed this
        call. ``max_buckets`` limits the number processed (used by the
        kill/resume test to simulate a dying run)."""
        done = self.done_buckets()
        pending = [b for b in range(self.n_buckets) if b not in done]
        if max_buckets is not None:
            pending = pending[:max_buckets]
        bucketed = transcripts.withColumn("_bucket", bucket_col(self.n_buckets))
        processed = []
        for b in pending:
            t0 = time.time()
            part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
            out = stage(part)
            target = os.path.join(self.out_path, f"bucket={b}")
            n_turns = part.count()
            out.write.mode("overwrite").parquet(target)
            n_out = out.sparkSession.read.parquet(target).count()
            self._mark_done(b, {
                "n_turns": n_turns,
                "n_rows_out": n_out,
                "wall_ms": int(1000 * (time.time() - t0)),
            })
            processed.append(b)
        return processed

    def read_output(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.out_path).parquet(
            os.path.join(self.out_path, "bucket=*"))
