"""G8 end-to-end generalization (r2 verdict demand #1 "Done" criterion):
oblique-case mentions of Czech names that the old fixture corpus NEVER
listed must link through the production build chain — generator →
namelist → automaton → matcher — proving G8 is a generator, not a lookup.
"""

from __future__ import annotations

import pytest

from kglinker.data.kb_fixture import KB_SCHEMA
from kglinker.kb.scoring import score_kb

# persons absent from the r2 fixture corpus (and from the standard KB
# fixture): a fleeting -e- surname, an -ová pair, an adjectival surname
_ROWS = [
    (1, "person", "Antonín Dvořák", "Antonín Dvořák (composer)", "", "",
     "Czech composer of the romantic era.", "M", "1841-09-08", "1904-05-01",
     "composer", "Czech", "", "", "", "", "", "", "",
     "https://wiki.example/Antonin_Dvorak", 4200, 88000, 300),
    (2, "person", "Karel Čapek", "Karel Čapek (writer)", "", "",
     "Czech writer, inventor of the word robot.", "M", "1890-01-09",
     "1938-12-25", "writer", "Czech", "", "", "", "", "", "", "",
     "https://wiki.example/Karel_Capek", 3900, 74000, 280),
    (3, "person", "Božena Němcová", "Božena Němcová (writer)", "", "",
     "Czech writer of the national revival.", "F", "1820-02-04",
     "1862-01-21", "writer", "Czech", "", "", "", "", "", "", "",
     "https://wiki.example/Bozena_Nemcova", 2100, 45000, 190),
    (4, "person", "Jan Novotný", "Jan Novotný (scientist)", "", "",
     "Czech physicist.", "M", "1930-03-02", "2001-07-15",
     "physicist", "Czech", "", "", "", "", "", "", "",
     "https://wiki.example/Jan_Novotny", 60, 1500, 9),
]


@pytest.fixture(scope="module")
def g8_artifacts(spark):
    from kglinker.automaton.build import KB_PROJECTION_COLS, build_artifacts
    from kglinker.kb.names import build_namelist, build_subname_map
    kb = score_kb(spark.createDataFrame(_ROWS, KB_SCHEMA))
    nl = build_namelist(kb)
    sub = build_subname_map(kb)
    return build_artifacts(
        [r.asDict() for r in kb.select(*KB_PROJECTION_COLS).collect()],
        [r.asDict() for r in nl.collect()],
        [r.asDict() for r in sub.collect()])


@pytest.mark.parametrize("text,surface,kb_id", [
    ("včera jsme mluvili o Antonínu Dvořákovi dlouho .",
     "Antonínu Dvořákovi", 1),
    ("kniha Karla Čapka vyšla v roce 1920 .", "Karla Čapka", 2),
    ("psali o Boženě Němcové v novinách .", "Boženě Němcové", 3),
    ("setkání s Janem Novotným proběhlo v Brně .", "Janem Novotným", 4),
    ("pozdrav od Boženy Němcové dorazil včas .", "Boženy Němcové", 3),
])
def test_generated_oblique_mention_links(g8_artifacts, text, surface, kb_id):
    from kglinker.extract.matcher import annotate_conversation
    rows = annotate_conversation("c0", [(0, text)], g8_artifacts)
    kb_rows = [(r.surface, r.kb_id) for r in rows if r.mention_type == "kb"]
    assert (surface, kb_id) in kb_rows, kb_rows


def test_generated_forms_reach_namelist(g8_artifacts):
    a = g8_artifacts.automaton
    for surface, kb_id in [("Antonína Dvořáka", 1), ("Karlu Čapkovi", 2),
                           ("Boženu Němcovou", 3), ("Jana Novotného", 4)]:
        got = a.get(surface)
        assert got is not None and kb_id in got[0], surface


def test_location_oblique_mentions_link(spark, artifacts):
    """Inflected Czech place mentions (locations run through namegen in
    the reference build too) link via the standard fixture KB: Praha is
    an ALIAS of Prague (kb 12) — alias surfaces inflect as well."""
    from kglinker.extract.matcher import annotate_conversation
    rows = annotate_conversation("c0", [
        (0, "jeli jsme do Prahy kolem Vltavy ."),
        (1, "bydleli jsme v Brně u řeky ."),
    ], artifacts)
    kb_rows = {(r.surface, r.kb_id) for r in rows if r.mention_type == "kb"}
    assert ("Prahy", 12) in kb_rows
    assert ("Vltavy", 19) in kb_rows
    assert ("Brně", 15) in kb_rows


# r4: the new location paradigms (soft-final feminine, -ec fleeting-e,
# "X nad/pod Y") through the full production chain — generator →
# namelist → automaton → matcher
_LOC_ROWS = [
    (21, "settlement", "Olomouc", "Olomouc (city)", "", "",
     "Moravian city on the Morava river.", "", "", "", "", "", "",
     "Czechia", "", "", "", "", "", "https://wiki.example/Olomouc",
     800, 21000, 60),
    (22, "settlement", "Liberec", "Liberec (city)", "", "",
     "City under the Jizera mountains.", "", "", "", "", "", "",
     "Czechia", "", "", "", "", "", "https://wiki.example/Liberec",
     700, 18000, 55),
    (23, "settlement", "Ústí nad Labem", "Ústí nad Labem (city)", "", "",
     "City at the Labe river confluence.", "", "", "", "", "", "",
     "Czechia", "", "", "", "", "", "https://wiki.example/Usti",
     600, 15000, 50),
    # r5: fem i-stem ď/ť (kost-class) and -j finals
    (24, "settlement", "Budapešť", "Budapešť (city)", "", "",
     "Capital of Hungary on the Danube.", "", "", "", "", "", "",
     "Hungary", "", "", "", "", "", "https://wiki.example/Budapest",
     900, 24000, 58),
    (25, "settlement", "Hanoj", "Hanoj (city)", "", "",
     "Capital of Vietnam on the Red River.", "", "", "", "", "", "",
     "Vietnam", "", "", "", "", "", "https://wiki.example/Hanoi",
     500, 12000, 45),
]


@pytest.fixture(scope="module")
def loc_artifacts(spark):
    from kglinker.automaton.build import KB_PROJECTION_COLS, build_artifacts
    from kglinker.kb.names import build_namelist, build_subname_map
    kb = score_kb(spark.createDataFrame(_LOC_ROWS, KB_SCHEMA))
    nl = build_namelist(kb)
    sub = build_subname_map(kb)
    return build_artifacts(
        [r.asDict() for r in kb.select(*KB_PROJECTION_COLS).collect()],
        [r.asDict() for r in nl.collect()],
        [r.asDict() for r in sub.collect()])


@pytest.mark.parametrize("text,surface,kb_id", [
    ("studovala v Olomouci na univerzitě .", "Olomouci", 21),
    ("vlak do Olomouce měl zpoždění .", "Olomouce", 21),
    ("bydleli v Liberci mnoho let .", "Liberci", 22),
    ("cesta z Liberce trvala hodinu .", "Liberce", 22),
    ("lodí jsme pluli nad Ústím nad Labem po proudu .",
     "Ústím nad Labem", 23),
    ("muzeum v Ústí nad Labem otevřelo výstavu .", "Ústí nad Labem", 23),
    # r5 paradigms end-to-end
    ("konference v Budapešti skončila včera .", "Budapešti", 24),
    ("letěli jsme nad Budapeští za soumraku .", "Budapeští", 24),
    ("dorazili do Hanoje v noci .", "Hanoje", 25),
    ("trh v Hanoji byl plný lidí .", "Hanoji", 25),
])
def test_new_location_paradigms_link(loc_artifacts, text, surface, kb_id):
    from kglinker.extract.matcher import annotate_conversation
    rows = annotate_conversation("c0", [(0, text)], loc_artifacts)
    kb_rows = [(r.surface, r.kb_id) for r in rows if r.mention_type == "kb"]
    assert (surface, kb_id) in kb_rows, kb_rows


def test_vocative_opt_in_links_end_to_end(spark):
    """r5: build_namelist(vocative=True) puts vocative surfaces in the
    automaton, so an address-form mention ("Jane Nováku, ...") links —
    while the DEFAULT build's surface set stays byte-identical to the
    vocative-less one (the opt-out guarantee, asserted on the full
    namelist, not just one name)."""
    from kglinker.automaton.build import KB_PROJECTION_COLS, build_artifacts
    from kglinker.extract.matcher import annotate_conversation
    from kglinker.kb.names import build_namelist, build_subname_map
    kb = score_kb(spark.createDataFrame(_ROWS, KB_SCHEMA))
    nl_default = sorted(r["surface"] for r in build_namelist(kb).collect())
    nl_off = sorted(r["surface"]
                    for r in build_namelist(kb, vocative=False).collect())
    assert nl_default == nl_off
    nl_voc = build_namelist(kb, vocative=True)
    voc_surfaces = {r["surface"] for r in nl_voc.collect()} - set(nl_default)
    assert "Antoníne Dvořáku" in voc_surfaces     # hard -e + k → -u
    assert "Karle Čapku" in voc_surfaces          # fleeting -el, -ek
    art = build_artifacts(
        [r.asDict() for r in kb.select(*KB_PROJECTION_COLS).collect()],
        [r.asDict() for r in nl_voc.collect()],
        [r.asDict() for r in build_subname_map(kb).collect()])
    rows = annotate_conversation(
        "c0", [(0, "Karle Čapku , vaše kniha vyšla .")], art)
    kb_rows = [(r.surface, r.kb_id) for r in rows if r.mention_type == "kb"]
    assert ("Karle Čapku", 2) in kb_rows, kb_rows


def test_g2_saint_mention_links(spark):
    """r5 verdict #5: the G2 saint cross-rewrites (Svatý/Sv./Sv —
    KB2namelist.py:283-290) must flow fixture → namelist → automaton →
    matcher: an 'Sv. X' mention links to the Svatý-named KB entity (row
    29), including an oblique inflected form."""
    from kglinker.automaton.build import KB_PROJECTION_COLS, build_artifacts
    from kglinker.data.kb_fixture import kb_df
    from kglinker.extract.matcher import annotate_conversation
    from kglinker.kb.names import build_namelist, build_subname_map
    kb = score_kb(kb_df(spark))
    art = build_artifacts(
        [r.asDict() for r in kb.select(*KB_PROJECTION_COLS).collect()],
        [r.asDict() for r in build_namelist(kb).collect()],
        [r.asDict() for r in build_subname_map(kb).collect()])
    for text, surface in [
        ("socha Sv. Václav stojí na náměstí .", "Sv. Václav"),
        ("legenda o knížeti jménem Svatý Václav .", "Svatý Václav"),
        ("kostel Svatého Václava byl vysvěcen roku 930 .",
         "Svatého Václava"),
    ]:
        rows = annotate_conversation("c0", [(0, text)], art)
        kb_rows = [(r.surface, r.kb_id) for r in rows
                   if r.mention_type == "kb"]
        assert (surface, 29) in kb_rows, (text, kb_rows)
