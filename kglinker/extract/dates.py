"""Date / interval extraction (SURVEY §2.5 M8).

Pure-Python port-of-semantics of ``/root/reference/dates.py``: regex
patterns over the turn text (``dates.py:254-283``), ISO rendering with
zero-padded unknown components — ``1920`` → ``1920-00-00`` — per the
``ISO_date`` model (``dates.py:23-95``); intervals (``1693-1734``,
``dates.py:150-164``) kept as a single mention with both endpoints.
Runs inside the per-conversation pandas UDF next to the automaton scan
(offsets must interleave with entity offsets for M9 overlap removal,
``ner_cz.py:1615-1619``).

Spark ``DateType`` is deliberately not used: it cannot represent the
reference's partial dates (``1920-00-00``) — FIXTURES.md §4.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from kglinker.data.wordlists import CZECH_MONTHS

__all__ = ["DateMatch", "find_dates", "iso"]

_MONTH_ALT = "|".join(sorted(CZECH_MONTHS, key=len, reverse=True))


@dataclass(frozen=True)
class DateMatch:
    start: int
    end: int
    kind: str       # 'date' | 'interval'
    resolved: str   # ISO (zero-padded) or 'ISO--ISO'
    confidence: int  # 100 certain, 80 unsure formats (dates.py:395-398)


def iso(y: int, m: int = 0, d: int = 0) -> str:
    """Zero-padded ISO with 00 for unknown parts (dates.py:50-64)."""
    return f"{y:04d}-{m:02d}-{d:02d}"


def _valid(y: int, m: int, d: int) -> bool:
    return 1000 <= y <= 2100 and 0 <= m <= 12 and 0 <= d <= 31


# priority-ordered patterns (most specific first), dates.py:254-283
_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"(?<!\d)(\d{4})-(\d{2})-(\d{2})(?!\d)"), "iso"),
    (re.compile(r"(?<!\d)(\d{1,2})\.\s?(%s)\s(\d{4})(?!\d)" % _MONTH_ALT), "cz_dmy"),
    (re.compile(r"(?<![\d.])(\d{1,2})\.\s?(\d{1,2})\.\s?(\d{4})(?!\d)"), "dmy"),
    (re.compile(r"\b(%s)\s(\d{4})(?!\d)" % _MONTH_ALT), "cz_my"),
    (re.compile(r"(?<!\d)(\d{4})\s?-\s?(\d{4})(?!\d)"), "interval"),
    (re.compile(r"(?<![\d.-])(\d{4})(?![\d.-])"), "year"),
]


_HAS_DIGIT = re.compile(r"\d")


def find_dates(text: str) -> list[DateMatch]:
    """Non-overlapping date/interval matches, priority then position order."""
    if _HAS_DIGIT.search(text) is None:  # cheap reject: no digits, no dates
        return []
    taken: list[tuple[int, int]] = []
    out: list[DateMatch] = []
    for pat, kind in _PATTERNS:
        for m in pat.finditer(text):
            s, e = m.span()
            if any(not (e <= ts or s >= te) for ts, te in taken):
                continue
            dm = _build(kind, m)
            if dm is None:
                continue
            taken.append((s, e))
            out.append(dm)
    out.sort(key=lambda d: d.start)
    return out


def _build(kind: str, m: re.Match) -> DateMatch | None:
    s, e = m.span()
    g = m.groups()
    if kind == "iso":
        y, mo, d = int(g[0]), int(g[1]), int(g[2])
        if not _valid(y, mo, d):
            return None
        return DateMatch(s, e, "date", iso(y, mo, d), 100)
    if kind == "dmy":
        d, mo, y = int(g[0]), int(g[1]), int(g[2])
        if not (_valid(y, mo, d) and 1 <= mo <= 12 and 1 <= d <= 31):
            return None
        return DateMatch(s, e, "date", iso(y, mo, d), 100)
    if kind == "cz_dmy":
        d, y = int(g[0]), int(g[2])
        mo = CZECH_MONTHS[g[1]]
        if not (_valid(y, mo, d) and 1 <= d <= 31):
            return None
        return DateMatch(s, e, "date", iso(y, mo, d), 100)
    if kind == "cz_my":
        mo, y = CZECH_MONTHS[g[0]], int(g[1])
        if not _valid(y, mo, 0):
            return None
        return DateMatch(s, e, "date", iso(y, mo), 100)
    if kind == "interval":
        y1, y2 = int(g[0]), int(g[1])
        if not (_valid(y1, 0, 0) and _valid(y2, 0, 0) and y1 < y2):
            return None
        return DateMatch(s, e, "interval", f"{iso(y1)}--{iso(y2)}", 100)
    if kind == "year":
        y = int(g[0])
        if not _valid(y, 0, 0):
            return None
        # bare year is the reference's "unsure" format → confidence 80
        return DateMatch(s, e, "date", iso(y), 80)
    return None
