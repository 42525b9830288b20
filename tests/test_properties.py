"""Property-based tests (SURVEY §5): randomized inputs, structural
invariants. Complements the deterministic goldens."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kglinker.extract.dates import find_dates
from kglinker.extract.matcher import annotate_conversation

NOISE = ["ran", "fine", "later", "ok,", "the", "12x", "—", "(note)", "a"]
SURFACES = ["Praha", "T. G. Masaryk", "Jan Novák", "Apache Spark",
            "Washington", "ona", "Novák", "1920", "12.11.1694"]


@st.composite
def texts(draw):
    words = draw(st.lists(st.sampled_from(NOISE + SURFACES),
                          min_size=0, max_size=30))
    return " ".join(words)


@settings(max_examples=60, deadline=None)
@given(texts())
def test_match_offsets_and_nonoverlap(text):
    art = test_match_offsets_and_nonoverlap.art
    ms = art.automaton.find_matches(text)
    prev_end = -1
    for m in ms:
        assert text[m.start:m.end] == m.surface
        assert m.start >= prev_end          # non-overlapping, sorted
        prev_end = m.end
        # token-aligned
        assert m.start == 0 or not text[m.start - 1].isalnum()
        assert m.end == len(text) or not text[m.end].isalnum()


@settings(max_examples=40, deadline=None)
@given(st.lists(texts(), min_size=1, max_size=6))
def test_annotation_deterministic_and_valid(turn_texts):
    art = test_annotation_deterministic_and_valid.art
    turns = list(enumerate(turn_texts))
    r1 = annotate_conversation("c", turns, art)
    r2 = annotate_conversation("c", turns, art)
    assert r1 == r2                          # pure function
    for r in r1:
        t = turn_texts[r.turn_idx]
        assert t[r.start:r.end] == r.surface
        assert r.mention_type in ("kb", "date", "interval", "coref")
        if r.mention_type in ("kb", "coref"):
            assert r.kb_id in art.kb_meta


@settings(max_examples=80, deadline=None)
@given(st.integers(1000, 2100), st.integers(1, 12), st.integers(1, 28))
def test_date_roundtrip(y, m, d):
    ds = find_dates(f"narozen {d}.{m}.{y} doma")
    assert len(ds) == 1
    assert ds[0].resolved == f"{y:04d}-{m:02d}-{d:02d}"


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bind_artifacts(artifacts):
    """Bind the session-scoped artifacts into the hypothesis tests
    (hypothesis can't take pytest fixtures directly)."""
    test_match_offsets_and_nonoverlap.art = artifacts
    test_annotation_deterministic_and_valid.art = artifacts
    test_token_index_equals_trie_walk.art = artifacts


@settings(max_examples=50, deadline=None)
@given(texts())
def test_token_index_equals_trie_walk(text):
    """The startswith-probe scan and the trie walk are the same function
    (the probe path is the default; the trie is the hot-first-token
    fallback) — forced head-to-head on random text."""
    from kglinker.automaton.build import Automaton
    art = test_token_index_equals_trie_walk.art
    auto = art.automaton
    old = Automaton._MAX_PROBES
    try:
        Automaton._MAX_PROBES = 10 ** 9
        via_index = auto.find_matches(text)
        Automaton._MAX_PROBES = -1
        via_trie = auto.find_matches(text)
    finally:
        Automaton._MAX_PROBES = old
    assert via_index == via_trie
