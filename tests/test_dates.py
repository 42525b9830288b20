"""M8 date extraction against the reference's inline pattern examples
(dates.py:256-279) and the zero-padded ISO rendering (dates.py:50-64)."""

from __future__ import annotations

from kglinker.extract.dates import find_dates


def _one(text):
    ds = find_dates(text)
    assert len(ds) == 1, (text, ds)
    return ds[0]


def test_numeric_dmy():
    d = _one("narozen 12.11.1694 v Praze")
    assert d.resolved == "1694-11-12"
    assert (d.start, d.end) == (8, 18)
    assert d.kind == "date"


def test_czech_textual():
    d = _one("zemřel 16. listopadu 2003 doma")
    assert d.resolved == "2003-11-16"
    assert d.kind == "date"


def test_month_year():
    d = _one("v listopadu 1918 skončila válka")
    assert d.resolved == "1918-11-00"


def test_year_only_zero_padded():
    d = _one("roku 1920 byl zvolen")
    assert d.resolved == "1920-00-00"
    assert d.confidence == 80


def test_interval():
    d = _one("žil 1693-1734 v Lipsku")
    assert d.kind == "interval"
    assert d.resolved == "1693-00-00--1734-00-00"


def test_iso():
    d = _one("dne 1918-11-14 vznikla republika")
    assert d.resolved == "1918-11-14"


def test_no_false_positive_on_numbers():
    assert find_dates("order 123456 shipped, qty 42") == []


def test_priority_non_overlap():
    ds = find_dates("od 14. listopadu 1918 do 1920")
    assert [d.resolved for d in ds] == ["1918-11-14", "1920-00-00"]
