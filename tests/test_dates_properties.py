"""Property-based date extraction tests (hypothesis): every generator
shape round-trips through find_dates to the expected ISO rendering, at
the right offsets, regardless of the surrounding text."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kglinker.extract.dates import find_dates, iso

_CZ = ["ledna", "února", "března", "dubna", "května", "června",
       "července", "srpna", "září", "října", "listopadu", "prosince"]
_EN = ["January", "February", "March", "April", "May", "June", "July",
       "August", "September", "October", "November", "December"]

years = st.integers(1200, 2050)
months = st.integers(1, 12)
days = st.integers(1, 28)
# prefix/suffix words without digits or date-ish tokens
pad = st.sampled_from(["ok", "zpráva", "reported", "viz", "meanwhile"])


@settings(max_examples=200, deadline=None)
@given(d=days, m=months, y=years, p=pad, s=pad)
def test_dotted_dmy_roundtrip(d, m, y, p, s):
    text = f"{p} {d}.{m}.{y} {s}"
    ds = find_dates(text)
    assert [x.resolved for x in ds] == [iso(y, m, d)]
    x = ds[0]
    assert text[x.start:x.end] == f"{d}.{m}.{y}"
    assert x.confidence == 80   # dotted dmy is an unsure form


@settings(max_examples=200, deadline=None)
@given(d=days, m=months, y=years, p=pad)
def test_czech_textual_roundtrip(d, m, y, p):
    text = f"{p} {d}. {_CZ[m - 1]} {y} ."
    ds = find_dates(text)
    assert [x.resolved for x in ds] == [iso(y, m, d)]
    assert ds[0].confidence == 100


@settings(max_examples=200, deadline=None)
@given(d=days, m=months, y=years, p=pad)
def test_english_mdy_roundtrip(d, m, y, p):
    text = f"{p} {_EN[m - 1]} {d}, {y} ."
    ds = find_dates(text)
    assert [x.resolved for x in ds] == [iso(y, m, d)]


@settings(max_examples=200, deadline=None)
@given(y1=st.integers(1200, 2000), gap=st.integers(1, 50), p=pad)
def test_year_interval_roundtrip(y1, gap, p):
    y2 = y1 + gap
    text = f"{p} {y1}-{y2} {p}"
    ds = find_dates(text)
    assert [x.kind for x in ds] == ["interval"]
    assert ds[0].resolved == f"{iso(y1)}--{iso(y2)}"
    assert ds[0].confidence == 80


@settings(max_examples=200, deadline=None)
@given(d=days, m=months, y=years, p=pad)
def test_slash_dmy_roundtrip(d, m, y, p):
    text = f"{p} {d}/{m}/{y} ."
    ds = find_dates(text)
    assert [x.resolved for x in ds] == [iso(y, m, d)]
    assert ds[0].confidence == 80


@settings(max_examples=100, deadline=None)
@given(y=st.integers(1200, 2050), p=pad)
def test_decade_roundtrip(y, p):
    dec = y - y % 10
    text = f"{p} {dec}s ."
    ds = find_dates(text)
    assert [x.resolved for x in ds] == [iso(dec)]


@settings(max_examples=100, deadline=None)
@given(nums=st.lists(st.integers(0, 999), min_size=1, max_size=5), p=pad)
def test_no_dates_in_small_numbers(nums, p):
    text = p + " " + " ".join(str(n) for n in nums) + " ."
    assert find_dates(text) == []
