"""D4/A6 score-trace tests: the per-type context percentiles reproduce the
reference's share-ratio arithmetic (ner_cz.py:805-970) — integer division
inside each sub-score, float mean across sub-scores."""

from __future__ import annotations

from kglinker.extract.matcher import _ConvContext


def _info(**kw):
    base = dict(type="person", name="X", gender="", confidence=0.0,
                nationality=(), jobs=(), person_dates=(), org_dates=(),
                wiki_url="", country="", location="", source_loc="")
    base.update(kw)
    return base


def test_person_nationality_share_integer_division():
    ctx = _ConvContext()
    ctx.nats[0] = ["Czech", "German", "French"]   # 3 distinct in paragraph
    # candidate holds 1 of the 3 → 1*100//3 = 33 (py2 floor division),
    # averaged over the 4 person sub-scores → 33/4 = 8.25
    info = _info(nationality=("Czech",))
    assert ctx.percentile(info, 0) == 33 / 4


def test_person_date_share_counts_pairs():
    ctx = _ConvContext()
    # duplicates kept (reference appends, never dedupes): 1950 twice
    ctx.dates[0] = ["1950", "1950", "1867-11"]
    info = _info(person_dates=("1950-01-01", "1867-11-07"))
    # containment both ways: 1950↔1950-01-01 (×2) + 1867-11↔1867-11-07
    # → 3 hits * 100 // 3 dates = 100 → /4 = 25.0
    assert ctx.percentile(info, 0) == 25.0


def test_person_profession_share():
    ctx = _ConvContext()
    ctx.profs[0] = ["composer", "pianist"]
    info = _info(jobs=("composer",))
    assert ctx.percentile(info, 0) == (1 * 100 // 2) / 4  # 50//4 = 12.5


def test_person_name_share_of_bucket_total():
    ctx = _ConvContext()
    ctx.mentions["person"] = {"George Washington": 3, "Marie Curie": 1}
    info = _info(name="George Washington")
    # 3*100//4 = 75 → /4 = 18.75 — the mentioned_in_par share of the
    # WHOLE person bucket (ner_cz.py:805-817)
    assert ctx.percentile(info, 0) == 75 / 4


def test_washington_person_vs_settlement_trace():
    """The ner_cz.py:292-297 example as a score trace: person 'George
    Washington' mentioned once by full name, no countries mentioned →
    person candidate gets 100//1→100 name share (avg 25), settlement gets
    0 name + 0 country (avg 0)."""
    ctx = _ConvContext()
    ctx.mentions["person"] = {"George Washington": 1}
    person = _info(name="George Washington")
    settlement = _info(type="settlement", name="Washington",
                       country="United States")
    assert ctx.percentile(person, 0) == 25.0
    assert ctx.percentile(settlement, 0) == 0.0
    # a 'United States' country mention flips the settlement's country
    # share to 100 → avg(0, 100) = 50
    ctx.mentions["country"] = {"United States": 1}
    assert ctx.percentile(settlement, 0) == 50.0


def test_settlement_counts_country_into_bucket():
    ctx = _ConvContext()
    ctx._count(_info(type="settlement", name="Brno", country="Czechia"))
    assert ctx.mentions["settlement"] == {"Brno": 1}
    assert ctx.mentions["country"] == {"Czechia": 1}


def test_org_event_date_overlap():
    ctx = _ConvContext()
    ctx.dates[0] = ["1805-12-02"]
    event = _info(type="event", name="Battle of Austerlitz",
                  org_dates=("1805-12-02", "1805-12-02"))
    # both START and END match the paragraph date → 2 hits * 100 // 1 =
    # 200 (reference arithmetic: hits can exceed 100), avg3 → 200/3
    assert ctx.percentile(event, 0) == (0 + 0 + 200) / 3


def test_watercourse_source_loc_share():
    ctx = _ConvContext()
    ctx.mentions["watercourse"] = {"Vltava": 1}
    ctx.mentions["geo"] = {"Šumava": 1}
    wc = _info(type="watercourse", name="Vltava", source_loc="Šumava")
    assert ctx.percentile(wc, 0) == (100 + 100) / 2


def test_person_artist_folds_into_person_bucket():
    ctx = _ConvContext()
    ctx._count(_info(type="person:artist", name="A"))
    assert ctx.mentions["person"] == {"A": 1}
    # person:fictional keeps its own bucket (reference quirk,
    # ner_cz.py:735-737 folds only :artist)
    ctx._count(_info(type="person:fictional", name="B"))
    assert ctx.mentions["person:fictional"] == {"B": 1}
