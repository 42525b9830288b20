"""Golden tests for annotate_conversation: disambiguation (D3/D4/D5),
fragment coref (D7), pronoun coref (D8), date interleaving (M8/M9),
offset/text-equality invariants."""

from __future__ import annotations

from kglinker.extract.matcher import annotate_conversation


def _rows(art, turns):
    return annotate_conversation("c0", list(enumerate(turns)), art)


def test_simple_person_and_date(artifacts):
    rows = _rows(artifacts, ["Tomáš Garrigue Masaryk was born 7.3.1850 ."])
    assert [(r.mention_type, r.surface, r.resolved) for r in rows] == [
        ("kb", "Tomáš Garrigue Masaryk", "1"),
        ("date", "7.3.1850", "1850-03-07"),
    ]
    # offsets index the stored text exactly (byte-equality invariant)
    t = "Tomáš Garrigue Masaryk was born 7.3.1850 ."
    for r in rows:
        assert t[r.start:r.end] == r.surface


def test_alias_resolves_same_entity(artifacts):
    rows = _rows(artifacts, ["T. G. Masaryk visited Brno in 1921 ."])
    kb = [r for r in rows if r.mention_type == "kb"]
    assert kb[0].kb_id == 1
    assert kb[1].kb_id == 15


def test_ambiguous_washington_context(artifacts):
    # "Washington" alone: settlement 14 vs person 2 (via redirect) —
    # static prior decides (D3): person has higher confidence.
    rows = _rows(artifacts, ["Washington is large ."])
    assert rows[0].mention_type == "kb"
    # with a preceding full-name person mention, D4 name-feedback (D5)
    # pushes the person sense:
    rows2 = _rows(artifacts, ["George Washington arrived .",
                              "Washington spoke for an hour ."])
    assert rows2[0].kb_id == 2
    assert rows2[1].kb_id == 2


def test_fragment_coref_nearest_predecessor(artifacts):
    rows = _rows(artifacts, ["Jan Novák wrote music .",
                             "Novák also wrote about Brno ."])
    frag = [r for r in rows if r.mention_type == "coref"]
    assert len(frag) == 1
    assert frag[0].kb_id == 6          # binds to Jan, not Petr
    assert frag[0].surface == "Novák"


def test_fragment_backoff_static_prior(artifacts):
    # no predecessor → D9 back-off to confidence-ordered subname candidates
    rows = _rows(artifacts, ["Connor wrote stories ."])
    assert rows and rows[0].mention_type == "coref"
    assert rows[0].kb_id == 5          # Flannery O'Connor


def test_pronoun_coref_gender(artifacts):
    rows = _rows(artifacts, ["Marie Curie met Jan Novák in Praha .",
                             "later ona moved to Germany .",
                             "later on moved to Brno ."])
    pron = [r for r in rows if r.mention_type == "coref"]
    assert len(pron) == 2
    assert pron[0].surface == "ona" and pron[0].kb_id == 8   # F → Curie
    assert pron[1].surface == "on" and pron[1].kb_id == 6    # M → Novák


def test_unresolvable_pronoun_dropped(artifacts):
    rows = _rows(artifacts, ["later on moved to Brno ."])
    assert [r.surface for r in rows] == ["Brno"]


def test_stoplisted_spark_not_entity(artifacts):
    rows = _rows(artifacts, ["I asked Spark to summarize Praha ."])
    assert [r.surface for r in rows] == ["Praha"]
    rows2 = _rows(artifacts, ["I asked Apache Spark to summarize Praha ."])
    assert [r.surface for r in rows2] == ["Apache Spark", "Praha"]


def test_date_entity_overlap_removed(artifacts):
    # entity span wins over a date hiding inside it (M9)
    rows = _rows(artifacts, ["the Battle of Austerlitz took place near Brno ."])
    assert [r.surface for r in rows] == ["Battle of Austerlitz", "Brno"]


def test_sanitize_keeps_offsets(artifacts):
    t = "Praha;\x01Brno"
    rows = _rows(artifacts, [t])
    assert [(r.surface, t[r.start:r.end]) for r in rows] == [
        ("Praha", "Praha"), ("Brno", "Brno")]


def test_unknown_name_detection(artifacts):
    # D10: capitalized runs absent from the KB get stable negative ids
    rows = annotate_conversation("c0", [
        (0, "Alice Wonderland met Jan Novák in Praha ."),
        (1, "later Alice Wonderland left ."),
    ], artifacts, detect_unknown_names=True)
    names = [r for r in rows if r.mention_type == "name"]
    assert [(n.surface, n.kb_id) for n in names] == [
        ("Alice Wonderland", -1), ("Alice Wonderland", -1)]
    # known entities are absorbed, not re-detected (ner_cz.py:1307-1330)
    assert not any(n.surface == "Jan Novák" for n in names)
    # default off → byte-identical behavior to before
    rows2 = annotate_conversation("c0", [(0, "Alice Wonderland left .")], artifacts)
    assert rows2 == []


def test_d2_during_keeps_event(artifacts):
    # "Austerlitz" is event 21 / settlement 23 ambiguous
    got = artifacts.automaton.get("Austerlitz")
    assert got is not None and set(got[0]) == {21, 23}
    rows = _rows(artifacts, ["they met during Austerlitz in Moravia ."])
    assert rows[0].kb_id == 21
    # without the 'during' cue the static prior decides (settlement 23 or
    # event 21, whichever scores higher — assert it is deterministic)
    r1 = _rows(artifacts, ["Austerlitz is a place ."])[0].kb_id
    r2 = _rows(artifacts, ["Austerlitz is a place ."])[0].kb_id
    assert r1 == r2


def test_d2_copula_job_keeps_person(artifacts):
    # "Washington" ambiguous person 2 / settlement 14; trailing copula +
    # person job restricts to the person (ner_cz.py:302-317)
    rows = _rows(artifacts, ["Washington was a famous general in the war ."])
    assert rows[0].kb_id == 2


def test_case_insensitive_lowercase_automaton():
    # P5 `-l` variant: artifacts built with lowercase=True match any casing
    from kglinker.automaton.build import build_artifacts
    kb = [dict(kb_id=1, type="settlement", name="Praha", confidence=50.0,
               wiki_url="https://w/1", aliases="", redirects="", gender="",
               date_of_birth="", date_of_death="", jobs="", nationality="",
               location="", country="", founded="", start="", end="")]
    nl = [dict(surface="Praha", kb_ids=[1], is_fragment=False)]
    art = build_artifacts(kb, nl, [], lowercase=True)
    rows = annotate_conversation("c", [(0, "we saw PRAHA and praha .")], art,
                                 case_insensitive=True)
    assert [(r.surface, r.kb_id) for r in rows] == [("PRAHA", 1), ("praha", 1)]
    # default case-sensitive path unchanged
    rows2 = annotate_conversation("c", [(0, "we saw PRAHA .")], art)
    assert rows2 == []


def test_d10_extension_absorbs_known_entity(artifacts):
    # find_incomplete_names (process_outputs.py:470-525): a known person
    # followed by a capitalized unknown word within the tolerance window
    # extends into ONE name mention that absorbs the entity and inherits
    # its sense (ner_cz.py:1326-1330)
    rows = annotate_conversation(
        "c0", [(0, "Jan Novák Wonderland spoke .")], artifacts,
        detect_unknown_names=True)
    names = [r for r in rows if r.mention_type == "name"]
    kbs = [r for r in rows if r.mention_type == "kb"]
    assert [(n.surface, n.kb_id) for n in names] == [("Jan Novák Wonderland", 6)]
    assert not any(k.surface == "Jan Novák" for k in kbs)


def test_d10_possessive_strip(artifacts):
    rows = annotate_conversation(
        "c0", [(0, "we read Alice Wonderland's book .")], artifacts,
        detect_unknown_names=True)
    names = [r for r in rows if r.mention_type == "name"]
    assert [n.surface for n in names] == ["Alice Wonderland"]


def test_d10_single_word_dropped(artifacts):
    rows = annotate_conversation(
        "c0", [(0, "then Wondera appeared suddenly .")], artifacts,
        detect_unknown_names=True)
    assert [r for r in rows if r.mention_type == "name"] == []


def test_d10_substring_names_removed(artifacts):
    # mark_substrings (process_outputs.py:199-220): a name whose word
    # parts all occur in a longer detected name is dropped
    rows = annotate_conversation(
        "c0", [(0, "Alice Bella Corn met people and Alice Bella waited .")],
        artifacts, detect_unknown_names=True)
    names = [r.surface for r in rows if r.mention_type == "name"]
    assert names == ["Alice Bella Corn"]
