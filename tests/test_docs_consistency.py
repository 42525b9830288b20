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
