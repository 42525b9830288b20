"""Docs-vs-code drift guards: every gate named in COVERAGE.md exists in
the registry, and every registry query is documented somewhere."""

from __future__ import annotations

import os
import re

from kglinker.queries import QUERIES

_REPO = os.path.join(os.path.dirname(__file__), "..")


def test_coverage_gate_names_exist():
    text = open(os.path.join(_REPO, "COVERAGE.md"), encoding="utf-8").read()
    named = set(re.findall(r"⊕ (\w+)", text)) | set(re.findall(r"○ (\w+)", text))
    unknown = named - set(QUERIES)
    assert not unknown, f"COVERAGE.md names unregistered gates: {unknown}"


def test_every_query_documented():
    docs = ""
    for f in ("COVERAGE.md", "BENCH/BASELINE.md"):
        docs += open(os.path.join(_REPO, f), encoding="utf-8").read()
    missing = [n for n in QUERIES if n not in docs]
    assert not missing, f"registry queries undocumented: {missing}"


def test_readme_registry_count_matches():
    """The README's 'registry: N operators' claim tracks the code (a
    stale count was an r5 self-review finding — this pins it)."""
    text = open(os.path.join(_REPO, "README.md"), encoding="utf-8").read()
    m = re.search(r"registry: (\d+) operators", text)
    assert m, "README no longer states the registry count"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} operators, registry has {len(QUERIES)}")


def test_registry_capped_at_50_flagship_first():
    """r6: the driver emits correctness rows for AT MOST the first 50
    registry entries in insertion order (r5 evidence: 54 registered →
    exactly the first 50 in the driver file). Growing past 50 silently
    un-verifies the tail — merge variants into discriminator-column
    gates instead — and the flagship pipeline + multimodal gates must
    stay in the guaranteed prefix."""
    names = list(QUERIES)
    assert len(names) <= 50, (
        f"registry has {len(names)} entries; the driver caps at 50 — "
        "merge variant gates (see __spark_entry__.py size contract)")
    assert names[:4] == ["kg_pipeline_mentions", "kg_pipeline_triples",
                         "multimodal_metadata", "multimodal_decode"]
    # every entry must still carry an exact oracle
    assert all(q.sql is not None for q in QUERIES.values())
