"""Regression tests for the round-1 review findings (VERDICT/ADVICE r1):

- score_kb: NULL wiki metrics must score 0, not 1.0 (least() skips nulls);
  a row with no wiki_backlinks gets score_wiki = 0 outright, matching the
  reference's insert_metrics behavior (metrics_knowledge_base.py).
- score_kb: columns_number must exclude the wiki metric columns
  (metrics_knowledge_base.py:298-311 nonempty_columns).
- alias_match_edges: two url-less rows sharing a surface must NOT merge
  (the +2 unique-field bonus requires equal NON-EMPTY urls).
- ngram_jaccard_pairs: the n parameter is honored (was hardcoded 3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kglinker.data.kb_fixture import KB_ROWS, KB_SCHEMA
from kglinker.kb.scoring import score_kb


def _row(overrides: dict) -> tuple:
    base = list(KB_ROWS[0])
    from kglinker.data.kb_fixture import KB_COLUMNS
    for k, v in overrides.items():
        base[KB_COLUMNS.index(k)] = v
    return tuple(base)


def test_score_kb_null_wiki_metrics_score_zero(spark):
    rows = [
        _row({"kb_id": 1}),
        _row({"kb_id": 2, "name": "No Stats Person",
              "wiki_backlinks": None, "wiki_hits": None, "wiki_ps": None}),
    ]
    kb = spark.createDataFrame(rows, KB_SCHEMA)
    out = {r["kb_id"]: r for r in score_kb(kb).collect()}
    assert out[2]["score_wiki"] == 0.0
    assert out[1]["score_wiki"] > 0.0
    # confidence ordering must favor the row with stats
    assert out[1]["confidence"] > out[2]["confidence"]


def test_score_kb_columns_number_excludes_wiki_metrics(spark):
    # two rows identical except wiki stats present/absent: score_metrics
    # must be EQUAL (wiki columns are not part of nonempty_columns)
    rows = [
        _row({"kb_id": 1}),
        _row({"kb_id": 2,
              "wiki_backlinks": None, "wiki_hits": None, "wiki_ps": None}),
    ]
    kb = spark.createDataFrame(rows, KB_SCHEMA)
    out = {r["kb_id"]: r for r in score_kb(kb).collect()}
    assert out[1]["score_metrics"] == out[2]["score_metrics"]


def test_alias_match_requires_nonempty_url_for_bonus(spark):
    from kglinker.graph.canonicalize import alias_match_edges
    # two DIFFERENT people sharing a surface, neither with a wiki_url and
    # no other equal fields: must not reach threshold 2
    rows = [
        _row({"kb_id": 1, "name": "John Smith", "aliases": "",
              "wiki_url": "", "date_of_birth": "1950-01-01",
              "nationality": "American", "jobs": "writer"}),
        _row({"kb_id": 2, "name": "John Smith", "aliases": "",
              "wiki_url": "", "date_of_birth": "1980-05-05",
              "nationality": "Czech", "jobs": "singer",
              "type": "person:other"}),
    ]
    kb = spark.createDataFrame(rows, KB_SCHEMA)
    assert alias_match_edges(kb, threshold=2).count() == 0


def test_ngram_jaccard_honors_n(spark):
    # two docs share every bigram but no 4-gram ⇒ pairs at n=2, none at n=4
    docs = spark.createDataFrame(
        [(1, "a b c", "s", "en", 5), (2, "a b c x y z a b", "s", "en", 15)],
        "doc_id long, text string, source string, lang string, n_chars long")
    from kglinker.ops.dedup import ngram_jaccard_pairs
    got2 = ngram_jaccard_pairs(docs, n=2, threshold=0.01).count()
    got4 = ngram_jaccard_pairs(docs, n=4, threshold=0.01).count()
    assert got2 == 1
    assert got4 == 0
