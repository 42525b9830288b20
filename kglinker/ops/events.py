"""Event-stream operators: gap sessionization + as-of join.

Both are single-shuffle window pipelines (partition by the entity key,
order by time) — the shapes that survive 100 TB because the only
exchange is the one hash shuffle on the session/join key, and every
per-key computation is a sorted scan (no self-join, no range-join
explosion).

Timestamps compare as exact integer microseconds (``unix_micros`` over
a TIMESTAMP cast — parquet NTZ values shift by the session zone, which
cancels in differences and ordering; DuckDB side uses ``epoch_us``) — float-second truncation can flip a boundary at
the gap edge and break cross-engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize", "asof_join"]


def sessionize(events: DataFrame, gap_minutes: int = 30,
               by: str = "user_id", ts: str = "ts",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Append ``session_seq`` (1-based per ``by`` key): a new session
    starts when the gap to the previous event exceeds ``gap_minutes``.

    One hash shuffle on ``by`` + one sorted window scan; the classic
    lag-flag-cumsum formulation (no session state store needed in batch;
    the streaming twin is ``session_window`` in Structured Streaming)."""
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    w = Window.partitionBy(by).orderBy(us, F.col(order_tiebreak))
    gap_us = int(gap_minutes) * 60 * 1_000_000
    new_sess = F.when(
        (us - F.lag(us).over(w)) > F.lit(gap_us), 1
    ).otherwise(0)
    # first event of a key: lag is NULL → when() yields 0; running sum + 1
    return events.withColumn(
        "session_seq",
        (F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
         + F.lit(1)).cast("int"))


def asof_join(left: DataFrame, right: DataFrame, by: str = "user_id",
              ts: str = "ts", right_id: str = "event_id",
              out_col: str = "asof_id") -> DataFrame:
    """Backward as-of join: every ``left`` row gains ``out_col`` = the
    ``right_id`` of the LATEST ``right`` row with ``right.ts <= left.ts``
    in the same ``by`` group (NULL when none precedes).

    Scalable shape — the union-tag trick: tag right rows 0 and left rows
    1, union, then one window scan per ``by`` key carrying the last seen
    right id (``last(..., ignorenulls=True)``). One shuffle, one sort,
    ZERO joins — unlike the naive ``left.ts >= right.ts`` range join,
    which Catalyst can only execute as a broadcast-nested-loop or a
    blown-up sort-merge. Equal timestamps: the right row sorts before the
    left row (tag order), so an exactly-simultaneous right row matches;
    ties among right rows resolve to the highest ``right_id``."""
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    r = right.select(F.col(by).alias("_by"), us.alias("_us"),
                     F.col(right_id).alias("_rid"),
                     F.lit(0).alias("_tag"))
    lcols = left.columns
    l = left.select(*lcols, F.col(by).alias("_by"), us.alias("_us"),
                    F.lit(None).cast(r.schema["_rid"].dataType).alias("_rid"),
                    F.lit(1).alias("_tag"))
    u = l.unionByName(r.select("_by", "_us", "_rid", "_tag"),
                      allowMissingColumns=True)
    w = (Window.partitionBy("_by")
         .orderBy("_us", "_tag", F.col("_rid").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (u.withColumn(out_col, F.last("_rid", ignorenulls=True).over(w))
            .filter(F.col("_tag") == 1)
            .select(*lcols, out_col))
