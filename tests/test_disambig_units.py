"""Focused disambiguation units on a handcrafted mini-KB: D3 first-max
tie-break, D4 context scores with integer-division parity, D6 tie fixup."""

from __future__ import annotations

from kglinker.automaton.build import build_artifacts
from kglinker.extract.matcher import annotate_conversation

_KB_COLS = dict(aliases="", redirects="", gender="", date_of_birth="",
                date_of_death="", jobs="", nationality="", location="",
                country="", founded="", start="", end="")


def _mini_artifacts():
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
    return build_artifacts(kb, namelist, [])


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


def test_d6_tie_adopts_nearest_strong():
    art = _mini_artifacts()
    rows = annotate_conversation("c", [
        (0, "Alfa spoke ."),              # tied → provisionally 1
        (1, "Alfa Crane arrived ."),      # strong, unambiguous 2
    ], art)
    # D6: the tied mention adopts the nearest strong same-surface... the
    # surfaces differ ('Alfa' vs 'Alfa Crane') so fixup must NOT fire:
    assert rows[0].kb_id == 1
    rows2 = annotate_conversation("c", [
        (0, "the german author Alfa wrote ."),  # context-strong → 2, untied
        (1, "Alfa spoke ."),                    # tied, same surface
    ], art)
    # same-surface strong mention exists → tied mention adopts sense 2
    assert rows2[0].kb_id == 2
    assert rows2[1].kb_id == 2
