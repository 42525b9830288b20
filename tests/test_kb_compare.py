"""Two-KB comparison & merge (reference NER/KnowBase/kb_compare.py)."""

from __future__ import annotations

from kglinker.graph.kb_compare import MatchConfig, match_two_kbs, merge_two_kbs

SCHEMA = ("kb_id long, name string, aliases string, wiki_url string, "
          "country string")


def _kb(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_unique_id_precedence_and_name_weights(spark):
    kb1 = _kb(spark, [
        (1, "Prague", "Praha", "https://w/prague", "CZ"),
        (2, "Brno", "", "", "CZ"),
        (3, "Plzen", "Pilsen", "", "CZ"),
    ])
    kb2 = _kb(spark, [
        (10, "Praha", "Prague city", "https://w/prague", "Czechia"),
        (11, "Brno", "Brno city", "", "Czechia"),
        (12, "Pilsen", "Plzen", "", "Czechia"),
    ])
    got = {(r["id1"], r["id2"]): (r["weight"], r["via"])
           for r in match_two_kbs(kb1, kb2).collect()}
    assert got[(1, 10)][1] == "unique"          # shared wiki url
    assert got[(2, 11)] == (1, "name")          # one shared value 'Brno'
    assert got[(3, 12)][0] == 2                  # Plzen+Pilsen cross hits


def test_one_to_one_resolution(spark):
    # two kb1 rows both name-match the same kb2 row: only the better
    # (higher weight, then lower id) keeps it
    kb1 = _kb(spark, [
        (1, "Springfield", "Springfield IL", "", ""),
        (2, "Springfield", "", "", ""),
    ])
    kb2 = _kb(spark, [(20, "Springfield", "Springfield IL", "", "")])
    got = match_two_kbs(kb1, kb2).collect()
    assert len(got) == 1
    assert (got[0]["id1"], got[0]["id2"]) == (1, 20)   # 2 hits beats 1


def test_merge_two_kbs_fields_and_unmatched(spark):
    kb1 = _kb(spark, [
        (1, "Prague", "Praha", "https://w/prague", ""),
        (2, "OnlyInOne", "", "", "CZ"),
    ])
    kb2 = _kb(spark, [
        (10, "Praha", "Golden City", "https://w/prague", "Czechia"),
        (11, "OnlyInTwo", "", "", "DE"),
    ])
    out = {r["name"]: r for r in merge_two_kbs(kb1, kb2).collect()}
    assert len(out) == 3
    # matched: kb1 primary, kb2 fills empty country, aliases unioned
    assert out["Prague"]["country"] == "Czechia"
    assert set(out["Prague"]["aliases"].split("|")) == {"Praha", "Golden City"}
    # unmatched from both sides appended; kb2 id offset past kb1 max
    assert out["OnlyInOne"]["country"] == "CZ"
    assert out["OnlyInTwo"]["kb_id"] == 11 + 2


def test_threshold_blocks_weak_matches(spark):
    kb1 = _kb(spark, [(1, "Alpha", "Shared", "", "")])
    kb2 = _kb(spark, [(10, "Beta", "Shared", "", "")])
    cfg = MatchConfig(threshold=2)
    assert match_two_kbs(kb1, kb2, cfg).count() == 0
    assert match_two_kbs(kb1, kb2, MatchConfig(threshold=1)).count() == 1
