"""Repeated-substring span detection (exact-substring dedup signal, Lee
et al. 2022): duplicated k-token windows merged into maximal per-doc
spans — unit goldens on a constructed corpus plus exact DuckDB parity
(suite-level oracle: the registry is capped at 50 driver gates, so this
operator's cross-engine check lives here with the same rows+schema+hash
rigor)."""

from __future__ import annotations

import duckdb
import pytest

from kglinker.ops.dedup import duplication_fraction, repeated_ngram_spans


def _docs(spark):
    boiler = "all rights reserved contact us at example dot com today"
    rows = [
        (0, f"alpha beta gamma {boiler} delta epsilon", "en", "web", 0),
        (1, f"one two three four {boiler} five six", "en", "web", 0),
        # doc 2: boilerplate appears twice within ONE doc (overlapping
        # windows must merge into a single span per occurrence run)
        (2, f"{boiler} bridge {boiler}", "en", "web", 0),
        (3, "totally unique text with no shared window anywhere here",
         "en", "web", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")


def test_repeated_spans_goldens(spark):
    docs = _docs(spark)
    spans = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in repeated_ngram_spans(docs, k=5).collect()}
    # boiler is 10 tokens; in doc 0 it occupies tokens [3, 12]; every
    # 5-window fully inside it repeats corpus-wide → one merged span
    assert (0, 3, 12) in spans
    assert (1, 4, 13) in spans
    # doc 2: tokens [0,9] and [11,20]; the 'bridge' windows are unique,
    # so two disjoint spans (merge must not jump the gap)
    assert (2, 0, 9) in spans and (2, 11, 20) in spans
    assert all(d != 3 for d, _, _ in spans)
    frac = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
            for r in duplication_fraction(docs, k=5).collect()}
    assert frac[0] == (15, 10, 0.6666)
    assert frac[2] == (21, 20, 0.9523)
    assert frac[3] == (9, 0, 0.0)


@pytest.mark.parametrize("k,min_repeats", [(5, 2), (3, 2), (5, 3)])
def test_repeated_spans_match_duckdb(spark, k, min_repeats):
    docs = _docs(spark)
    got = sorted(map(tuple, repeated_ngram_spans(
        docs, k=k, min_repeats=min_repeats).collect()))
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    sql = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr
               FROM documents),
    w AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                 substr(md5(array_to_string(
                     list_slice(arr, CAST(i AS INTEGER),
                                CAST(i + {k} - 1 AS INTEGER)), ' ')),
                        1, 16) AS h
          FROM (SELECT doc_id, arr,
                       unnest(range(1, len(arr) - {k} + 2)) AS i FROM t)),
    d AS (SELECT h FROM w GROUP BY h HAVING count(*) >= {min_repeats}),
    hits AS (SELECT doc_id, pos FROM w JOIN d USING (h)),
    isl AS (SELECT doc_id, pos,
                   CASE WHEN pos > coalesce(max(pos + {k} - 1) OVER
                         (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), -1) + 1
                        THEN 1 ELSE 0 END AS brk
            FROM hits),
    isl2 AS (SELECT doc_id, pos,
                    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS g
             FROM isl)
    SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
           CAST(max(pos + {k} - 1) AS INTEGER) AS span_end
    FROM isl2 GROUP BY doc_id, g ORDER BY doc_id, span_start"""
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want and got
