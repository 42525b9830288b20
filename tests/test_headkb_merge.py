"""S2 HEAD-KB parser / TSV loader and K4 attribute merge."""

from __future__ import annotations

import pytest

from kglinker.data.headkb import load_kb_tsv, normalize_col, parse_head_kb

HEAD = "\n".join([
    "<person>{e}ID\tTYPE\tNAME\t{m[a]}ALIASES\tDESCRIPTION\tGENDER\t"
    "DATE OF BIRTH\t{m}JOBS\t{ue}WIKI URL\tWIKI BACKLINKS\tWIKI HITS\tWIKI PS",
    "<settlement>{e}ID\tTYPE\tNAME\t{m[a]}ALIASES\tDESCRIPTION\tCOUNTRY\t"
    "{ue}WIKI URL\tWIKI BACKLINKS\tWIKI HITS\tWIKI PS",
])
# note: reference FLAGS are strings like "MULTIPLE VALUES"; PREFIX in [..]
HEAD_REAL = "\n".join([
    "<person>ID\tTYPE\tNAME\t{MULTIPLE VALUES}ALIASES\tDESCRIPTION\tGENDER\t"
    "DATE OF BIRTH\t{MULTIPLE VALUES}JOBS\tWIKI URL\tWIKI BACKLINKS\t"
    "WIKI HITS\tWIKI PS",
    "<settlement>ID\tTYPE\tNAME\t{MULTIPLE VALUES}ALIASES\tDESCRIPTION\t"
    "COUNTRY\tWIKI URL\tWIKI BACKLINKS\tWIKI HITS\tWIKI PS",
])

PERSON_ROW = ("p1\tperson\tMarie Curie\tMaria Skłodowska\tPolish physicist."
              "\tF\t1867-11-07\tphysicist|chemist\thttps://w/curie\t70\t100\t9")
SETTLEMENT_ROW = ("s1\tsettlement\tPrague\tPraha\tPrague is the capital of "
                  "Czechia.\tCzechia\thttps://w/prague\t44\t130\t26")


def test_parse_head_kb_layouts():
    h = parse_head_kb(HEAD_REAL)
    assert set(h.types) == {"person", "settlement"}
    assert h.type_col == 1
    person = {c.name: c for c in h.types["person"]}
    assert person["ALIASES"].index == 3
    assert "MULTIPLE" in person["ALIASES"].flags
    assert h.arity("person") == 12 and h.arity("settlement") == 10
    assert normalize_col("DATE OF BIRTH") == "date_of_birth"
    assert "date_of_birth" in h.unified_columns()
    assert {"aliases", "jobs"} <= h.multi_valued()


def test_parse_head_kb_type_col_must_be_consistent():
    bad = "<person>ID\tTYPE\tNAME\n<settlement>ID\tNAME\tTYPE"
    with pytest.raises(ValueError, match="TYPE column index"):
        parse_head_kb(bad)


def test_load_kb_tsv_end_to_end(spark, tmp_path):
    tsv = tmp_path / "kb.tsv"
    tsv.write_text(PERSON_ROW + "\n" + SETTLEMENT_ROW + "\n")
    kb = load_kb_tsv(spark, HEAD_REAL, str(tsv))
    rows = {r["kb_id"]: r for r in kb.collect()}
    assert rows[1]["name"] == "Marie Curie"
    assert rows[1]["jobs"] == "physicist|chemist"
    assert rows[1]["wiki_backlinks"] == 70          # cast long
    assert rows[2]["country"] == "Czechia"
    assert rows[2]["jobs"] == ""                     # column absent for type
    # the unified frame drives the production scoring + namelist builds
    from kglinker.kb.names import build_namelist
    from kglinker.kb.scoring import score_kb
    for c in ("redirects", "nationality", "location", "source_loc",
              "founded", "cancelled", "start", "end",
              "date_of_death"):
        if c not in kb.columns:
            from pyspark.sql import functions as F
            kb = kb.withColumn(c, F.lit(""))
    scored = score_kb(kb)
    got = {r["kb_id"]: r["confidence"] for r in scored.collect()}
    assert got[1] > 0 and got[2] > 0
    nl = {r["surface"]: r for r in build_namelist(scored).collect()}
    assert list(nl["Marie Curie"]["kb_ids"]) == [1]
    assert list(nl["Praha"]["kb_ids"]) == [2]        # alias reachable
    assert "Prague, Czechia" in nl                   # G6 gate fires (desc)


def test_load_kb_tsv_arity_violation(spark, tmp_path):
    tsv = tmp_path / "bad.tsv"
    tsv.write_text(PERSON_ROW + "\textra_column\n")
    with pytest.raises(ValueError, match="arity"):
        load_kb_tsv(spark, HEAD_REAL, str(tsv))
    # non-strict mode drops the row instead
    kb = load_kb_tsv(spark, HEAD_REAL, str(tsv), strict=False)
    assert kb.count() == 0


def test_merged_entity_table_praha(spark, kb_scored):
    from kglinker.graph.canonicalize import canonical_map
    from kglinker.graph.materialize import merged_entity_table
    canon = canonical_map(kb_scored)
    merged = merged_entity_table(kb_scored, canon)
    rows = {r["entity_id"]: r for r in merged.collect()}
    praha = rows[12]                      # Prague(12) + Praha(13) merged
    assert praha["n_members"] == 2
    assert praha["name"] == "Prague"      # primary (lowest kb_id) wins
    # multi-valued union keeps both aliases, primary-first
    assert set(praha["aliases"].split("|")) == {"Praha", "Prague"}
    assert 13 not in rows
    # untouched singleton passes through
    assert rows[2]["name"] == "George Washington" and rows[2]["n_members"] == 1


def test_merged_entity_table_fill_from_member(spark):
    from pyspark.sql import functions as F
    from kglinker.graph.materialize import merged_entity_table
    kb = spark.createDataFrame(
        [(1, "person", "A B", "", ""), (2, "person", "A B", "x|y", "1900")],
        "kb_id long, type string, name string, aliases string, founded string")
    canon = spark.createDataFrame([(1, 1), (2, 1)], "kb_id long, canon_id long")
    row = merged_entity_table(kb, canon).collect()[0]
    # single-valued empty on the primary → filled from the other member
    assert row["founded"] == "1900"
    assert row["aliases"] == "x|y"


def test_load_kb_head_all(spark, tmp_path):
    from kglinker.data.headkb import load_kb_head_all
    p = tmp_path / "KB-HEAD.all"
    p.write_text("VERSION=2026-08-16\n" + HEAD_REAL + "\n"
                 + PERSON_ROW + "\n" + SETTLEMENT_ROW + "\n")
    version, kb = load_kb_head_all(spark, str(p))
    assert version == "2026-08-16"
    rows = {r["kb_id"]: r for r in kb.collect()}
    assert rows[1]["name"] == "Marie Curie"
    assert rows[2]["name"] == "Prague"
    assert len(rows) == 2
    # bad header rejected
    import pytest
    q = tmp_path / "bad.all"
    q.write_text("no version line\n")
    with pytest.raises(ValueError, match="VERSION"):
        load_kb_head_all(spark, str(q))


def test_pipeline_from_kb_head_all(spark, tmp_path):
    """Real-KB front door end-to-end: KB-HEAD.all snapshot → unified KB →
    scored KB + automaton → extraction over transcripts → edges, with the
    snapshot VERSION recorded in every lineage row."""
    from pyspark.sql import functions as F
    from kglinker.data.headkb import ensure_kb_columns, load_kb_head_all
    from kglinker.jobs.pipeline import run_pipeline
    from kglinker.runtime.checkpoint import LineageCheckpointer

    p = tmp_path / "KB-HEAD.all"
    p.write_text("VERSION=kb-2026-08\n" + HEAD_REAL + "\n"
                 + PERSON_ROW + "\n" + SETTLEMENT_ROW + "\n")
    version, kb = load_kb_head_all(spark, str(p))
    kb = ensure_kb_columns(kb)

    t = spark.createDataFrame(
        [("c1", 0, "user", "Marie Curie visited Prague in 1903 .", None,
          __import__("datetime").datetime(2025, 1, 1)),
         ("c1", 1, "user", "later Praha was quiet .", None,
          __import__("datetime").datetime(2025, 1, 1, 0, 1))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    work = str(tmp_path / "run")
    edges = run_pipeline(spark, t, work, n_buckets=2, kb=kb,
                         kb_snapshot=version)
    co = edges.filter(F.col("pred") == "co_occurs_in_conv").collect()
    assert len(co) == 1 and {co[0]["subj"], co[0]["obj"]} == {"1", "2"}
    ck = LineageCheckpointer(f"{work}/mentions", f"{work}/_lineage", 2)
    assert all(r["kb_snapshot"] == "kb-2026-08" for r in ck.lineage_records())
