"""M8 date extraction against the reference's inline pattern examples
(dates.py:256-279), the unsure-confidence list (dates.py:288-298), and the
zero-padded ISO rendering (dates.py:50-64)."""

from __future__ import annotations

import pytest

from kglinker.extract.dates import find_dates


def _one(text):
    ds = find_dates(text)
    assert len(ds) == 1, (text, ds)
    return ds[0]


# --- every inline example comment from the reference pattern list ----------

GOLDENS = [
    # intervals (dates.py:256-264)
    ("June. 6, 2005 – Sept. 12, 2007", "interval", "2005-06-06--2007-09-12", 100),
    ("20 March, 1856 – 10 January 1941", "interval", "1856-03-20--1941-01-10", 100),
    ("1856 - 20 March, 1856", "interval", "1856-00-00--1856-03-20", 100),
    ("Mar. 30, 1853 - 1888", "interval", "1853-03-30--1888-00-00", 100),
    ("March, 1856 - 1941", "interval", "1856-03-00--1941-00-00", 100),
    ("March, 1856 – January 1941", "interval", "1856-03-00--1941-01-00", 100),
    ("1856 – January 1941", "interval", "1856-00-00--1941-01-00", 100),
    ("1740 - 10 February 1808", "interval", "1740-00-00--1808-02-10", 100),
    ("12.11.1694-13.11.1694", "interval", "1694-11-12--1694-11-13", 100),
    ("1693-1734", "interval", "1693-00-00--1734-00-00", 80),
    ("1693 to 1734", "interval", "1693-00-00--1734-00-00", 80),
    ("od 1693 do 1734", "interval", "1693-00-00--1734-00-00", 80),
    # dates (dates.py:266-279)
    ("lis. 12, 2007", "date", "2007-11-12", 100),
    ("1999-12-28", "date", "1999-12-28", 100),
    ("2010 listopad 16", "date", "2010-11-16", 100),
    ("12-11-1694", "date", "1694-11-12", 80),
    ("12/11/1694", "date", "1694-11-12", 80),
    ("12.11.1694", "date", "1694-11-12", 80),
    ("12. 11. 1694", "date", "1694-11-12", 80),
    ("16. listopadu 2003", "date", "2003-11-16", 100),
    ("November 2003", "date", "2003-11-00", 100),
    ("roku 1694", "date", "1694-00-00", 80),
    ("1690s", "date", "1690-00-00", 100),
    # "1694-99": only the year matches (yyyy-yy is unsure-list-only,
    # never a pattern) — reference behavior
    ("1694-99", "date", "1694-00-00", 80),
]


@pytest.mark.parametrize("text,kind,resolved,conf", GOLDENS)
def test_reference_golden(text, kind, resolved, conf):
    d = _one(text)
    assert (d.kind, d.resolved, d.confidence) == (kind, resolved, conf), text


def test_offsets_anchor_to_source():
    d = _one("narozen 12.11.1694 v Praze")
    assert (d.start, d.end) == (8, 18)
    assert d.resolved == "1694-11-12"


def test_month_year_czech():
    assert _one("v listopadu 1918 skončila válka").resolved == "1918-11-00"


def test_year_only_zero_padded():
    d = _one("roku 1920 byl zvolen")
    assert d.resolved == "1920-00-00"
    assert d.confidence == 80


def test_no_false_positive_on_numbers():
    assert find_dates("order 123456 shipped, qty 42") == []
    assert find_dates("pi is 3.1415 ok") == []


def test_do_is_interval_delimiter():
    # " do " joins two dates into ONE interval (long_interval_delim,
    # reference dates.py:241) — was two separate dates before r2
    d = _one("od 14. listopadu 1918 do 1920")
    assert d.kind == "interval"
    assert d.resolved == "1918-11-14--1920-00-00"


def test_two_separate_dates_without_delimiter():
    ds = find_dates("dne 14. listopadu 1918 a pak roku 1920")
    assert [d.resolved for d in ds] == ["1918-11-14", "1920-00-00"]


def test_split_interval_reference_mode():
    ds = find_dates("žil 1693 to 1734 v Lipsku", split_interval=True)
    assert [(d.kind, d.resolved) for d in ds] == [
        ("date", "1693-00-00"), ("date", "1734-00-00")]
    assert ds[0].start == 4 and ds[0].end == 8
    assert ds[1].start == 12 and ds[1].end == 16


def test_english_month_day_comma_year():
    assert _one("born June 6, 2005 here").resolved == "2005-06-06"
