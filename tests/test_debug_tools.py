"""Debug tooling (kglinker/debug.py — the counterpart of the reference's
debug.py + debugChangesInEntities, ner_cz.py:1564-1574): stable mention
rendering, empty diff for identical runs, and flag-toggle tracing that
reports exactly which opt-in switch changed the annotation."""

from __future__ import annotations

from kglinker.automaton.build import build_artifacts
from kglinker.debug import diff_mentions, format_mentions, trace_flag_effects
from kglinker.extract.matcher import annotate_conversation

_KB_COLS = dict(aliases="", redirects="", gender="", date_of_birth="",
                date_of_death="", jobs="", nationality="", location="",
                country="", founded="", start="", end="")


def _art(spellcheck=False):
    kb = [
        dict(kb_id=1, type="settlement", name="Prague", confidence=60.0,
             wiki_url="https://w/1", **_KB_COLS),
        dict(kb_id=2, type="settlement", name="Brno", confidence=40.0,
             wiki_url="https://w/2", **_KB_COLS),
    ]
    nl = [dict(surface="Prague", kb_ids=[1], is_fragment=False),
          dict(surface="Brno", kb_ids=[2], is_fragment=False)]
    return build_artifacts(kb, nl, [], spellcheck=spellcheck)


def test_identical_runs_diff_empty():
    art = _art()
    turns = [(0, "we visited Prague yesterday .")]
    a = annotate_conversation("c", turns, art)
    b = annotate_conversation("c", turns, art)
    assert format_mentions(a)  # something was annotated
    assert diff_mentions(a, b) == ""


def test_diff_shows_changed_mention():
    art = _art()
    a = annotate_conversation("c", [(0, "we visited Prague .")], art)
    b = annotate_conversation("c", [(0, "we visited Brno today .")], art)
    d = diff_mentions(a, b)
    assert "-" in d and "+" in d
    assert "Prague" in d and "Brno" in d


def test_trace_reports_spellcheck_effect():
    """On a misspelled mention, ONLY the spellcheck toggle changes the
    annotation — the trace must name it and no other flag."""
    art = _art(spellcheck=True)
    turns = [(0, "we visited Pragve yesterday .")]
    effects = trace_flag_effects("c", turns, art)
    assert set(effects) == {"spellcheck"}
    assert "Pragve" in effects["spellcheck"]

    # correctly spelled input: no flag changes anything
    assert trace_flag_effects("c", [(0, "we visited Prague .")], art) == {}
