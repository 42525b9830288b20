"""KB static-disambiguation scoring (SURVEY §2.4 A3–A4).

Reimplements the formulas of ``/root/reference/metrics_knowledge_base.py``:

- per-type value→max normalization ``min(v/max, 1.0)`` with the max deflated
  ×0.25 for ``wiki_backlinks`` / ``wiki_hits`` (``:364-369`` — note it is
  value/max normalization, *not* percent_rank),
- ``score_wiki = 100 * wavg([backlinks, hits, ps], [5, 5, 1])`` (``:382-389``),
- ``score_metrics = 100 * avg([description_length, columns_number])``
  (``:390-394``),
- ``confidence = wavg([score_wiki, score_metrics], [5, 1])`` (``:395-398``),
  all emitted with 2-decimal rounding (``"%.2f"``, ``:389-398``).

Spark-first: one ``Window.partitionBy('type')`` supplies every per-type max —
a single shuffle over the (small) KB; everything else is column arithmetic
inside whole-stage codegen. At 10^8-row KB scale this is still one shuffle
keyed by ``type`` (~10 distinct values → AQE coalesces; skew is irrelevant
because the aggregate state is 5 doubles per type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["score_kb", "METRIC_COLS"]

# (column, deflate) — deflate ×0.25 for backlinks/hits per
# metrics_knowledge_base.py:364-369
WIKI_METRICS = [("wiki_backlinks", 0.25), ("wiki_hits", 0.25), ("wiki_ps", 1.0)]
WIKI_WEIGHTS = [5.0, 5.0, 1.0]
METRIC_COLS = ["description_length", "columns_number"]


def _norm(col: str, deflate: float, w: Window) -> F.Column:
    # NULL metric ⇒ 0 contribution (metrics_knowledge_base.py insert_metrics
    # leaves the score term at 0 when the stat is absent); without the guard
    # least(NULL/max, 1.0) would return 1.0 because least() skips nulls.
    mx = F.max(F.col(col)).over(w) * F.lit(deflate)
    return F.when(F.col(col).isNull() | (mx <= 0), F.lit(0.0)).otherwise(
        F.least(F.col(col) / mx, F.lit(1.0))
    )


def score_kb(kb: DataFrame) -> DataFrame:
    """kb → kb + (score_wiki, score_metrics, confidence), the S7 sink input."""
    w = Window.partitionBy("type")

    # description_length / columns_number raw metrics
    # (metrics_knowledge_base.py:298-311) — the reference's nonempty_columns
    # excludes the wiki metric columns (and any score columns) so a row with
    # wiki stats is not double-counted into score_metrics.
    excluded = {"kb_id"} | {c for c, _ in WIKI_METRICS} \
        | {"score_wiki", "score_metrics", "confidence"}
    non_id_cols = [c for c in kb.columns if c not in excluded]
    cols_number = sum(
        (F.when(F.col(c).cast("string").isNotNull() & (F.col(c).cast("string") != ""), 1)
          .otherwise(0))
        for c in non_id_cols
    )
    df = kb.withColumn("description_length",
                       F.length(F.coalesce(F.col("description"), F.lit(""))).cast("double")
                       ).withColumn("columns_number", cols_number.cast("double"))

    wiki_norms = [_norm(c, d, w) for c, d in WIKI_METRICS]
    metric_norms = [_norm(c, 1.0, w) for c in METRIC_COLS]

    # no backlinks stat at all ⇒ score_wiki = 0 (reference
    # metrics_knowledge_base.py insert_metrics: the wiki score is only
    # emitted when the backlinks stat exists for the row)
    score_wiki = F.when(F.col("wiki_backlinks").isNull(), F.lit(0.0)).otherwise(
        F.lit(100.0) * (
            sum(n * F.lit(wt) for n, wt in zip(wiki_norms, WIKI_WEIGHTS))
            / F.lit(sum(WIKI_WEIGHTS))
        )
    )
    score_metrics = F.lit(100.0) * (
        sum(metric_norms) / F.lit(float(len(metric_norms)))
    )
    confidence = (score_wiki * 5.0 + score_metrics * 1.0) / 6.0

    return (df
            .withColumn("score_wiki", F.round(score_wiki, 2))
            .withColumn("score_metrics", F.round(score_metrics, 2))
            .withColumn("confidence", F.round(confidence, 2))
            .drop("description_length", "columns_number"))
