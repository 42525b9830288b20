"""Unit tests for KB scoring (A3–A4), surface expansion (P*/G*), the
namelist build (A1–A2) and the automaton (reflexive dictionary property —
the reference's strongest test artifact, figa/test_figa.py:99-151)."""

from __future__ import annotations

from kglinker.kb import expand as X


def test_scoring_formulas(kb_scored):
    rows = {r["kb_id"]: r for r in kb_scored.collect()}
    # every score in [0, 100], 2-decimal rounded
    for r in rows.values():
        assert 0.0 <= r["score_wiki"] <= 100.0
        assert 0.0 <= r["score_metrics"] <= 100.0
        assert 0.0 <= r["confidence"] <= 100.0
        assert round(r["confidence"], 2) == r["confidence"]
    # the per-type max of wiki_ps gets norm 1.0; backlinks/hits deflated ×.25
    # → any entity with ≥25% of max backlinks+hits and max ps scores 100
    persons = [r for r in rows.values() if r["type"] == "person"]
    top = max(persons, key=lambda r: r["wiki_hits"])
    assert top["score_wiki"] == 100.0
    # confidence ordering sensible: Washington(person) > J.G.B. Bach
    assert rows[2]["confidence"] > rows[3]["confidence"]


def test_person_variants_bach():
    v = set(X.person_variants("Johann Gottfried Bernhard Bach"))
    # abbreviation family from KB2namelist.py:324-349 comments
    assert "J. G. B. Bach" in v
    assert "Johann Bach" in v
    assert "J. Bach" in v
    assert "Bach, Johann" in v
    assert "Bach, J." in v
    assert "J.G.B. Bach" in v
    assert "JGB Bach" in v
    # G1 permutations present
    assert "Bach Johann Gottfried Bernhard" in v


def test_person_variants_preposition_no_permutation():
    v = set(X.person_variants("Ludwig van Beethoven"))
    assert "Beethoven Ludwig van" not in v  # van blocks G1 (KB2namelist.py:271-280)


def test_subnames():
    # Persons.py:31-34 docstring examples
    assert set(X.subnames("Flannery O'Connor")) == {"Flannery", "O'Connor", "Connor"}
    s = set(X.subnames("Ludwig van Beethoven"))
    assert {"Ludwig", "Beethoven", "van Beethoven"} <= s


def test_unsuitable_filter():
    assert X.is_unsuitable("x", "person")                 # too short
    assert X.is_unsuitable("a(b)", "person")              # unsuitable chars
    assert X.is_unsuitable("12345", "person")             # all digits
    assert X.is_unsuitable("lowercase name", "person")    # lowercase-first
    assert not X.is_unsuitable("US", "country", frozenset({"US"}))  # allowlist
    assert not X.is_unsuitable("Apache Spark", "organisation")


def test_nationality_variants():
    v = X.nationality_variants("Czech")
    assert "Czech" in v and "czech" in v and "Czechý" in v and "czechý" in v


def test_accent_strip():
    assert X.remove_accent("Tomáš Novák") == "Tomas Novak"


def test_namelist_contents(artifacts):
    a = artifacts.automaton
    # direct surfaces present with confidence-ordered ids
    ids, frag = a.get("Prague")
    assert set(ids) == {12, 13}
    assert ids[0] == 12  # higher-confidence row first (A2)
    # alias tag stripped (P1): Beethoven alias carried #ntype=nick
    assert a.get("Beethoven") is not None
    # stoplisted 'Spark' demoted to fragment-only (P6)
    got = a.get("Spark")
    assert got is not None and got[0] == () and got[1] is True
    # pronouns present as senseless fragments (G11)
    assert a.get("on") == ((), True)
    # G10 bare surname direct entry for high-confidence person
    ids_m, _ = a.get("Masaryk")
    assert 1 in ids_m
    # subname map holds shared surname with both Nováks (D7 input)
    assert set(artifacts.subname_map["Novák"]) == {6, 7}


def test_reflexive_dictionary_property(artifacts):
    """Every dictionary surface round-trips: matching the surface string
    alone yields exactly one match spanning the whole string with exactly
    the namelist payload (figa/test_figa.py:99-151)."""
    a = artifacts.automaton
    checked = 0
    for surface, payload in a._entries.items():
        ms = a.find_matches(surface)
        assert len(ms) == 1, surface
        m = ms[0]
        assert (m.start, m.end) == (0, len(surface)), surface
        assert (m.kb_ids, m.is_fragment) == payload, surface
        checked += 1
    assert checked > 100  # the dictionary is non-trivial


def test_longest_match_non_overlap(artifacts):
    a = artifacts.automaton
    ms = a.find_matches("Tomáš Garrigue Masaryk met George Washington in Washington")
    surfaces = [m.surface for m in ms]
    assert surfaces == ["Tomáš Garrigue Masaryk", "George Washington", "Washington"]
    # the third is ambiguous (person-redirect vs settlement)
    assert len(ms[2].kb_ids) >= 2


def test_token_boundary(artifacts):
    a = artifacts.automaton
    # 'Praha' inside a longer word must not match
    assert a.find_matches("Prahaland is fictional") == []
    # punctuation boundary OK
    assert [m.surface for m in a.find_matches("We visited Praha, then left.")] == ["Praha"]


def test_saint_variants():
    v = set(X.person_variants("Sv. Václav"))
    assert {"Svatý Václav", "Sv Václav"} <= v


def test_settlement_country_variant():
    desc = "Washington is the capital city of the United States of America."
    assert X.settlement_variants("Washington", "United States", desc) == [
        "Washington, US", "Washington, United States"]
    # G6 DESCRIPTION gate (KB2namelist.py:378): name absent from the
    # description → NO variant
    assert X.settlement_variants("Washington", "United States",
                                 "Capital of the USA.") == []
    # country already inside the name → NO variant
    assert X.settlement_variants("Washington, United States",
                                 "United States",
                                 "Washington, United States is big.") == []


def test_czech_inflection_generator():
    # G8 is generator-backed since r3 (kglinker/kb/czech_morph.py);
    # full goldens in tests/test_czech_morph.py
    forms = X.czech_inflections("Jan Novák", "M")
    assert forms == ["Jana Nováka", "Janem Novákem",
                     "Janovi Novákovi", "Janu Novákovi"]
    # works for names no fixture ever listed
    assert "Antonína Dvořáka" in X.czech_inflections("Antonín Dvořák", "M")


def test_g6_in_namelist(artifacts):
    # settlement variant reaches the automaton (G6 wired through names.py)
    got = artifacts.automaton.get("Washington, United States")
    assert got is not None and 14 in got[0]


def test_g8_inflections_in_namelist(artifacts):
    # G8 fixture corpus wired into the build (create_cedar.sh:136-142):
    # oblique-case forms reach the automaton with the right sense
    a = artifacts.automaton
    got = a.get("Jana Nováka")
    assert got is not None and 6 in got[0]
    got2 = a.get("Tomášem Garriguem Masarykem")
    assert got2 is not None and 1 in got2[0]


def test_g8_inflected_mention_links(artifacts):
    from kglinker.extract.matcher import annotate_conversation
    rows = annotate_conversation(
        "c0", [(0, "mluvili jsme o Janu Novákovi a hudbě .")], artifacts)
    assert [(r.surface, r.kb_id) for r in rows if r.mention_type == "kb"] == [
        ("Janu Novákovi", 6)]


def test_inflection_confidence_prune(spark, kb_scored):
    """Payload-size lever: rows below inflection_min_confidence keep their
    nominative surfaces but skip G8 declension generation."""
    from kglinker.kb.names import build_namelist
    confs = {r["kb_id"]: r["confidence"]
             for r in kb_scored.select("kb_id", "confidence").collect()}
    # pick a floor between the Novák pair's confidences and TGM's
    full = build_namelist(kb_scored)
    pruned = build_namelist(kb_scored,
                            inflection_min_confidence=confs[1])  # TGM's
    f = {r["surface"] for r in full.collect()}
    p = {r["surface"] for r in pruned.collect()}
    assert p < f
    assert "Tomáše Garrigua Masaryka" in p          # TGM row kept
    assert "Jana Nováka" in f and "Jana Nováka" not in p   # low-conf pruned
    assert "Jan Novák" in p                          # nominative stays
