"""Distributed extraction stage: transcripts → mentions DataFrame.

``applyInPandas`` grouped by ``conv_id`` with turns sorted by ``turn_idx``
inside each group — the Spark idiom for the reference's per-document
sequential semantics (SURVEY §2.10, §3.1). The broadcast ``KBArtifacts``
payload is loaded once per executor (Spark broadcast = the reference's
shm-resident KB + automaton).

Scale design:
- explicit ``repartition(n, conv_id)`` ahead of the grouped map (north_rule:
  partitioning handled explicitly); conversations are the parallelism unit,
  they are numerous (10^9+) and individually tiny → near-uniform partitions;
- the *text* never shuffles twice: one hash shuffle on conv_id feeds both
  grouping and downstream per-conversation writes;
- per-batch work is Arrow-batched; the Python loop is per conversation,
  never per row of the corpus;
- hot-key mentions (frequent tool names) do NOT skew this stage (grouping
  key is conv_id, not surface); surface-keyed skew is handled where it
  occurs — the co-occurrence aggregation — via salting
  (:mod:`kglinker.runtime.partitioning`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kglinker.extract.matcher import MENTIONS_SCHEMA_DDL, annotate_conversation

__all__ = ["extract_mentions", "annotate_pdf"]


def annotate_pdf(pdf: pd.DataFrame, art) -> pd.DataFrame:
    """Annotate a pandas batch holding ≥1 whole conversations (single-process
    oracle entry point as well — identical code path to the executors)."""
    cols = ["conv_id", "turn_idx", "start", "end", "mention_type",
            "surface", "kb_id", "resolved"]
    rows: list[tuple] = []
    for conv_id, grp in pdf.groupby("conv_id", sort=False):
        grp = grp.sort_values("turn_idx")
        turns = list(zip(grp["turn_idx"].astype(int), grp["text"]))
        for r in annotate_conversation(str(conv_id), turns, art):
            rows.append((r.conv_id, r.turn_idx, r.start, r.end,
                         r.mention_type, r.surface, r.kb_id, r.resolved))
    out = pd.DataFrame(rows, columns=cols)
    if out.empty:
        out = pd.DataFrame({c: pd.Series(dtype=t) for c, t in zip(
            cols, ["object", "int32", "int32", "int32", "object", "object",
                   "float64", "object"])})
    return out


def extract_mentions(transcripts: DataFrame, artifacts_bcast,
                     num_partitions: int | None = None) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) → mentions.

    ``artifacts_bcast``: broadcast from
    :func:`kglinker.automaton.build.broadcast_artifacts`.
    """
    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return annotate_pdf(pdf, artifacts_bcast.value)

    return (transcripts
            .select("conv_id", "turn_idx", "text")
            .repartition(num_partitions, "conv_id")
            .groupBy("conv_id")
            .applyInPandas(run, MENTIONS_SCHEMA_DDL))
