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
              out_col: str = "asof_id", direction: str = "backward",
              tolerance_us: int | None = None) -> DataFrame:
    """As-of join: every ``left`` row gains ``out_col`` = the ``right_id``
    of the matching ``right`` row in the same ``by`` group (NULL when no
    match). ``direction``:

    - ``"backward"`` (default): LATEST right row with right.ts ≤ left.ts.
    - ``"forward"``: EARLIEST right row with right.ts ≥ left.ts.
    - ``"nearest"``: whichever of the two candidates has the smaller
      absolute time delta; an exact tie picks the backward one (the
      pandas ``merge_asof`` convention).

    ``tolerance_us``: optional maximum |left.ts − right.ts| in exact
    integer microseconds; candidates farther away resolve to NULL.

    Scalable shape — the union-tag trick: tag right rows 0 and left rows
    1, union, then per-key window scans carrying the last seen right row
    (``last(struct, ignorenulls=True)``). One hash shuffle on ``by``,
    ZERO joins — unlike the naive range join, which Catalyst can only
    execute as a broadcast-nested-loop or a blown-up sort-merge.
    ``forward``/``nearest`` add a second sort (descending scan) over the
    SAME exchange — still no join operator. Equal timestamps match in
    both directions (tag order puts right rows first in either scan);
    ties among right rows resolve to the highest ``right_id`` backward
    and the lowest forward."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
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
    # right rows carry a (us, rid) struct; left rows carry NULL, so
    # last(..., ignorenulls) skips them in either scan direction
    rstruct = F.when(F.col("_tag") == 0,
                     F.struct(F.col("_us").alias("us"),
                              F.col("_rid").alias("rid")))
    u = u.withColumn("_r", rstruct)
    frame = (Window.unboundedPreceding, Window.currentRow)
    wb = (Window.partitionBy("_by")
          .orderBy("_us", "_tag", F.col("_rid").asc_nulls_first())
          .rowsBetween(*frame))
    wf = (Window.partitionBy("_by")
          .orderBy(F.col("_us").desc(), "_tag",
                   F.col("_rid").desc_nulls_first())
          .rowsBetween(*frame))

    def _gate(cand: F.Column, delta: F.Column) -> F.Column:
        ok = cand.isNotNull()
        if tolerance_us is not None:
            ok = ok & (delta <= F.lit(int(tolerance_us)))
        return ok

    if direction == "backward":
        cand = F.last("_r", ignorenulls=True).over(wb)
        chosen = F.when(_gate(cand, F.col("_us") - cand["us"]), cand["rid"])
    elif direction == "forward":
        cand = F.last("_r", ignorenulls=True).over(wf)
        chosen = F.when(_gate(cand, cand["us"] - F.col("_us")), cand["rid"])
    else:
        b = F.last("_r", ignorenulls=True).over(wb)
        f = F.last("_r", ignorenulls=True).over(wf)
        db, df = F.col("_us") - b["us"], f["us"] - F.col("_us")
        b_ok, f_ok = _gate(b, db), _gate(f, df)
        chosen = (F.when(b_ok & f_ok,
                         F.when(df < db, f["rid"]).otherwise(b["rid"]))
                  .when(b_ok, b["rid"])
                  .when(f_ok, f["rid"]))
    return (u.withColumn(out_col, chosen)
            .filter(F.col("_tag") == 1)
            .select(*lcols, out_col))
