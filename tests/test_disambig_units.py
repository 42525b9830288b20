"""Focused disambiguation units on a handcrafted mini-KB: D3 first-max
tie-break, D4 context scores with integer-division parity, D6 tie fixup."""

from __future__ import annotations

from kglinker.automaton.build import build_artifacts
from kglinker.extract.matcher import annotate_conversation

_KB_COLS = dict(aliases="", redirects="", gender="", date_of_birth="",
                date_of_death="", jobs="", nationality="", location="",
                country="", founded="", start="", end="")


def _mini_artifacts(extra_namelist=None):
    kb = [
        dict(kb_id=1, type="person", name="Alfa Brook", confidence=50.0,
             wiki_url="https://w/1", **{**_KB_COLS, "gender": "M",
                                        "nationality": "Czech",
                                        "date_of_birth": "1900-01-01"}),
        dict(kb_id=2, type="person", name="Alfa Crane", confidence=50.0,
             wiki_url="https://w/2", **{**_KB_COLS, "gender": "M",
                                        "nationality": "German",
                                        "date_of_birth": "1950-01-01"}),
    ]
    namelist = [
        # shared ambiguous surface with EQUAL confidence → D3 tie
        dict(surface="Alfa", kb_ids=[1, 2], is_fragment=False),
        dict(surface="Alfa Brook", kb_ids=[1], is_fragment=False),
        dict(surface="Alfa Crane", kb_ids=[2], is_fragment=False),
        # P7 nationality forms are senseless fragment rows in the real
        # namelist build — replicate for the M10 context-token path
        dict(surface="german", kb_ids=[], is_fragment=True),
        dict(surface="czech", kb_ids=[], is_fragment=True),
    ]
    return build_artifacts(kb, namelist + (extra_namelist or []), [])


def test_d3_first_max_tie_break():
    art = _mini_artifacts()
    rows = annotate_conversation("c", [(0, "Alfa spoke .")], art)
    # equal static scores → reference semantics: first max in A2 candidate
    # order wins (ner_cz.py:338 list.index(max))
    assert rows[0].kb_id == 1


def test_d4_nationality_breaks_tie():
    art = _mini_artifacts()
    rows = annotate_conversation(
        "c", [(0, "the german author Alfa spoke .")], art)
    # 'german' nationality token (P7 lowercase variant) lifts candidate 2
    assert rows[0].kb_id == 2


def test_d4_birthyear_breaks_tie():
    art = _mini_artifacts()
    rows = annotate_conversation("c", [(0, "in 1950 Alfa spoke .")], art)
    kb = [r for r in rows if r.mention_type == "kb"]
    assert kb[0].kb_id == 2


def test_name_share_from_unambiguous_mention():
    art = _mini_artifacts()
    rows = annotate_conversation("c", [
        (0, "Alfa spoke ."),              # ambiguous 1/2
        (1, "Alfa Crane arrived ."),      # strong, unambiguous 2
    ], art)
    # reference Context counts unambiguous mentions document-wide BEFORE the
    # sequential pass (shared MENTIONS_TYPE dict, ner_cz.py:635): the turn-0
    # mention sees 'Alfa Crane' in the person bucket → name-share 100 →
    # candidate 2 wins on context, no D6 needed
    assert rows[0].kb_id == 2
    rows2 = annotate_conversation("c", [
        (0, "the german author Alfa wrote ."),  # context-strong → 2
        (1, "Alfa spoke ."),                    # ambiguous, same surface
    ], art)
    # D5 feedback: turn-0's chosen person increments the person bucket, so
    # turn-1's candidate 2 gets a positive name share and wins
    assert rows2[0].kb_id == 2
    assert rows2[1].kb_id == 2


def test_d6_sense_first_fixup():
    """A poor mention adopts the nearest strong mention sharing a SENSE
    even when the surfaces differ (ner_cz.py:1258-1263).

    Construction: two ambiguous surfaces 'Alfa' and 'Beta' both map to
    {1, 2}. Turn 0's 'Alfa' scores no context (poor; the nationality cue
    only appears in turn 1, and ambiguous mentions are not phase-B
    counted). Turn 1's 'Beta' is disambiguated to 2 by the nationality
    context → strong. D6 then rebinds turn 0 to sense 2 through the
    sense index — the surface index alone ('Alfa' ≠ 'Beta') could not."""
    art = _mini_artifacts(extra_namelist=[
        dict(surface="Beta", kb_ids=[1, 2], is_fragment=False)])
    rows = annotate_conversation("c", [
        (0, "Alfa spoke ."),
        # nationality + birth-year cues: candidate 2 averages 50, beating
        # candidate 1's 25 from the turn-0 feedback (which chose 1)
        (1, "the german author Beta wrote in 1950 ."),
    ], art)
    assert rows[0].surface == "Alfa" and rows[0].kb_id == 2
    assert rows[1].surface == "Beta" and rows[1].kb_id == 2
