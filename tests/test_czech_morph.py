"""G8 declension-generator goldens (r2 verdict demand #1).

Two layers:

1. The r2 HAND-CHECKED fixture corpus (formerly
   ``kglinker.data.wordlists.CZECH_INFLECTIONS``, consumed as data until
   r3) — the generator must REPRODUCE every one of those forms for every
   corpus name, i.e. the corpus is now an assertion, not an input.
2. Hand-verified full-set goldens for names OUTSIDE the old corpus
   (standard public Czech declension: fleeting -e-, -a stems, adjectival
   and -ová surnames, soft stems, indeclinable foreign words) — proving
   the generator generalizes, which is exactly what the fixture approach
   could not do.
"""

from __future__ import annotations

import pytest

from kglinker.kb.czech_morph import czech_name_inflections, guess_gender

# r2 hand-checked corpus (gender per the KB fixture rows)
R2_CORPUS: list[tuple[str, str, list[str]]] = [
    ("Jan Novák", "M",
     ["Jana Nováka", "Janu Novákovi", "Janovi Novákovi", "Janem Novákem"]),
    ("Petr Novák", "M",
     ["Petra Nováka", "Petru Novákovi", "Petrovi Novákovi",
      "Petrem Novákem"]),
    ("Tomáš Garrigue Masaryk", "M",
     ["Tomáše Garrigua Masaryka", "Tomáši Garriguovi Masarykovi",
      "Tomášem Garriguem Masarykem"]),
    ("Josef Švejk", "M",
     ["Josefa Švejka", "Josefu Švejkovi", "Josefem Švejkem"]),
    ("Marie Curie", "F", ["Marii Curie", "Marií Curie"]),
    ("Ludwig van Beethoven", "M",
     ["Ludwiga van Beethovena", "Ludwigu van Beethovenovi",
      "Ludwigem van Beethovenem"]),
    ("George Washington", "M",
     ["George Washingtona", "Georgi Washingtonovi", "Georgem Washingtonem"]),
    ("Johann Gottfried Bernhard Bach", "M",
     ["Johanna Gottfrieda Bernharda Bacha",
      "Johannem Gottfriedem Bernhardem Bachem"]),
    ("Flannery O'Connor", "F",
     ["Flannery O'Connorová", "Flannery O'Connorové"]),
]


@pytest.mark.parametrize("name,gender,forms",
                         R2_CORPUS, ids=[c[0] for c in R2_CORPUS])
def test_generator_reproduces_r2_corpus(name, gender, forms):
    got = set(czech_name_inflections(name, gender))
    missing = set(forms) - got
    assert not missing, f"{name}: generator lost hand-checked forms {missing}"
    # nominative itself never emitted; every emitted form differs from it
    assert name not in got


# full-set goldens OUTSIDE the old corpus (hand-verified standard Czech)
NEW_GOLDENS: list[tuple[str, str, set[str]]] = [
    ("Antonín Dvořák", "M",
     {"Antonína Dvořáka", "Antonínu Dvořákovi", "Antonínovi Dvořákovi",
      "Antonínem Dvořákem"}),
    ("Karel Čapek", "M",      # fleeting -e-: Čapek → Čapk-
     {"Karla Čapka", "Karlu Čapkovi", "Karlovi Čapkovi", "Karlem Čapkem"}),
    ("Václav Havel", "M",     # fleeting -e- in -el after consonant
     {"Václava Havla", "Václavu Havlovi", "Václavovi Havlovi",
      "Václavem Havlem"}),
    ("Božena Němcová", "F",   # žena given + -ová surname
     {"Boženy Němcové", "Boženě Němcové", "Boženu Němcovou",
      "Boženou Němcovou"}),
    ("Milan Kundera", "M",    # předseda -a stem surname
     {"Milana Kundery", "Milanu Kunderovi", "Milanovi Kunderovi",
      "Milana Kunderu", "Milanem Kunderou"}),
    ("Jan Novotný", "M",      # adjectival surname
     {"Jana Novotného", "Janu Novotnému", "Janovi Novotnému",
      "Janu Novotném", "Janovi Novotném", "Janem Novotným"}),
    ("Eliška Krásnohorská", "F",  # k→c alternation + adjectival fem
     {"Elišky Krásnohorské", "Elišce Krásnohorské", "Elišku Krásnohorskou",
      "Eliškou Krásnohorskou"}),
]


@pytest.mark.parametrize("name,gender,expected",
                         NEW_GOLDENS, ids=[c[0] for c in NEW_GOLDENS])
def test_generator_beyond_fixture_exact(name, gender, expected):
    assert set(czech_name_inflections(name, gender)) == expected


def test_word_paradigm_details():
    from kglinker.kb.czech_morph import decline_fem_word, decline_masc_word
    # soft masc (muž)
    d = decline_masc_word("Tomáš")
    assert d["gen"] == ["Tomáše"] and d["instr"] == ["Tomášem"]
    assert set(d["dat"]) == {"Tomáši", "Tomášovi"}
    # mute -gue (hard on [g])
    d = decline_masc_word("Garrigue")
    assert d["gen"] == ["Garrigua"] and d["instr"] == ["Garriguem"]
    # soft-read -ge: nominative = genitive (soudce-like)
    d = decline_masc_word("George")
    assert d["gen"] == ["George"] and "Georgi" in d["dat"]
    # -ec fleeting + soft: Němec → Němce
    d = decline_masc_word("Němec")
    assert d["gen"] == ["Němce"] and d["instr"] == ["Němcem"]
    # pronominal foreign -y: Harry → Harryho
    d = decline_masc_word("Harry")
    assert d["gen"] == ["Harryho"] and d["dat"] == ["Harrymu"]
    # soft adjectival -í: Jiří → Jiřího
    d = decline_masc_word("Jiří")
    assert d["gen"] == ["Jiřího"] and d["instr"] == ["Jiřím"]
    # fem -a with r→ř alternation
    d = decline_fem_word("Klára", is_surname=False)
    assert d["dat"] == ["Kláře"] and d["gen"] == ["Kláry"]
    # fem consonant surname derives -ová; given name does not
    d = decline_fem_word("O'Connor", is_surname=True)
    assert "O'Connorové" in d["gen"] and d["nom_var"] == ["O'Connorová"]
    assert decline_fem_word("Karin", is_surname=False)["gen"] == ["Karin"]


def test_gender_guess_heuristic():
    assert guess_gender("Božena Němcová") == "F"
    assert guess_gender("Eliška Krásnohorská") == "F"
    assert guess_gender("Marie Curie") == "F"
    assert guess_gender("Jan Novák") == "M"
    assert guess_gender("George Washington") == "M"


def test_invariant_words():
    # initials and name prepositions never inflect
    forms = czech_name_inflections("T. G. Masaryk", "M")
    assert "T. G. Masaryka" in forms
    assert all(f.startswith("T. G. ") for f in forms)
    # fully indeclinable names yield nothing rather than junk
    assert czech_name_inflections("J. R. R.", "M") == []


# location declension (the reference's namegen runs over locations too —
# grammar_locations.txt; czechnames README: "jmen osob a lokací")
LOCATION_GOLDENS: list[tuple[str, set[str]]] = [
    ("Praha", {"Prahy", "Praze", "Prahu", "Prahou"}),
    ("Brno", {"Brna", "Brnu", "Brně", "Brnem"}),
    ("Plzeň", {"Plzně", "Plzni", "Plzní"}),
    ("Třeboň", {"Třeboně", "Třeboni", "Třeboní"}),
    ("Budějovice", {"Budějovic", "Budějovicím", "Budějovicích",
                    "Budějovicemi"}),
    ("Tábor", {"Tábora", "Táboru", "Táboře", "Táborem"}),
    ("Londýn", {"Londýna", "Londýnu", "Londýně", "Londýnem"}),
    ("Vltava", {"Vltavy", "Vltavě", "Vltavu", "Vltavou"}),
    ("Anglie", {"Anglii", "Anglií"}),
    # r4 — feminine soft finals (píseň-class; r3 verdict #3), incl. the
    # high-frequency exonyms Paříž/Remeš
    ("Olomouc", {"Olomouce", "Olomouci", "Olomoucí"}),
    ("Třebíč", {"Třebíče", "Třebíči", "Třebíčí"}),
    ("Kroměříž", {"Kroměříže", "Kroměříži", "Kroměříží"}),
    ("Dobříš", {"Dobříše", "Dobříši", "Dobříší"}),
    ("Telč", {"Telče", "Telči", "Telčí"}),
    ("Skuteč", {"Skuteče", "Skuteči", "Skutečí"}),
    ("Jaroměř", {"Jaroměře", "Jaroměři", "Jaroměří"}),
    ("Přelouč", {"Přelouče", "Přelouči", "Přeloučí"}),
    ("Aš", {"Aše", "Aši", "Aší"}),
    ("Paříž", {"Paříže", "Paříži", "Paříží"}),
    ("Remeš", {"Remeše", "Remeši", "Remeší"}),
    # r4 — masc inanimate -ec with fleeting -e-
    ("Liberec", {"Liberce", "Liberci", "Libercem"}),
    ("Hradec", {"Hradce", "Hradci", "Hradcem"}),
    ("Jablonec", {"Jablonce", "Jablonci", "Jabloncem"}),
    ("Žatec", {"Žatce", "Žatci", "Žatcem"}),
    ("Bílovec", {"Bílovce", "Bílovci", "Bílovcem"}),
    # r4 — neuter -í (stavení-class) and adjectival -á
    ("Ústí", {"Ústím"}),
    ("Veselí", {"Veselím"}),
    ("Hluboká", {"Hluboké", "Hlubokou"}),
    # r4 — dictionary-listed SINGULAR -ice (růže paradigm), vs the
    # plural default (Budějovice above)
    ("Bystřice", {"Bystřici", "Bystřicí"}),
    ("Sušice", {"Sušici", "Sušicí"}),
    ("Roudnice", {"Roudnici", "Roudnicí"}),
    ("Kopřivnice", {"Kopřivnici", "Kopřivnicí"}),
    ("Březnice", {"Březnici", "Březnicí"}),
    ("Skalice", {"Skalici", "Skalicí"}),
    ("Lipnice", {"Lipnici", "Lipnicí"}),
    ("Telnice", {"Telnici", "Telnicí"}),
    # r5 — fem i-stem ď/ť (kost-class): ď/ť soften to d/t before i/í.
    # Třešť also admits píseň-class Třeště; the generator emits the
    # kost-class subset, valid for both
    ("Budapešť", {"Budapešti", "Budapeští"}),
    ("Třešť", {"Třešti", "Třeští"}),
    # r5 — -j finals: gen -e / dat,loc -i are shared by the feminine
    # (Hanoj, instr Hanojí) and masc-inanimate (Dubaj, instr Dubajem)
    # paradigms; the gender-ambiguous instrumental is withheld
    ("Hanoj", {"Hanoje", "Hanoji"}),
    ("Dubaj", {"Dubaje", "Dubaji"}),
    # conservative contract: unrecognized patterns emit NOTHING
    ("Prague", set()), ("Germany", set()), ("Czechia", set()),
    ("United States", set()), ("TGM", set()),
    # conservative: foreign -ec / bare-c names decline differently
    # (Quebecu, not *Quebce/*Quebece) → emit nothing
    ("Quebec", set()), ("Chimac", set()),
]


# r4 — "X nad/pod Y" river toponyms: the head declines, the preposition
# phrase stays invariant (namegen's grammar_locations analysis)
RIVER_GOLDENS: list[tuple[str, set[str]]] = [
    ("Ústí nad Labem", {"Ústím nad Labem"}),
    ("Kamýk nad Vltavou", {"Kamýku nad Vltavou", "Kamýka nad Vltavou",
                           "Kamýce nad Vltavou", "Kamýkem nad Vltavou"}),
    ("Žďár nad Sázavou", {"Žďáru nad Sázavou", "Žďára nad Sázavou",
                          "Žďáře nad Sázavou", "Žďárem nad Sázavou"}),
    ("Brandýs nad Labem", {"Brandýsu nad Labem", "Brandýsa nad Labem",
                           "Brandýsem nad Labem"}),
    ("Rožnov pod Radhoštěm", {"Rožnovu pod Radhoštěm",
                              "Rožnova pod Radhoštěm",
                              "Rožnově pod Radhoštěm",
                              "Rožnovem pod Radhoštěm"}),
    ("Týn nad Vltavou", {"Týnu nad Vltavou", "Týna nad Vltavou",
                         "Týně nad Vltavou", "Týnem nad Vltavou"}),
    ("Kostelec nad Orlicí", {"Kostelce nad Orlicí", "Kostelci nad Orlicí",
                             "Kostelcem nad Orlicí"}),
    ("Hluboká nad Vltavou", {"Hluboké nad Vltavou", "Hlubokou nad Vltavou"}),
    ("Veselí nad Moravou", {"Veselím nad Moravou"}),
    ("Rožmitál pod Třemšínem", {"Rožmitálu pod Třemšínem",
                                "Rožmitála pod Třemšínem",
                                "Rožmitálem pod Třemšínem"}),
    # unrecognized head → whole name emits nothing (conservative)
    ("Lipno nad Vltavou", {"Lipna nad Vltavou", "Lipnu nad Vltavou",
                           "Lipně nad Vltavou", "Lipnem nad Vltavou"}),
    ("Sázava nad Sázavou", {"Sázavy nad Sázavou", "Sázavě nad Sázavou",
                            "Sázavu nad Sázavou", "Sázavou nad Sázavou"}),
]


@pytest.mark.parametrize("name,expected", RIVER_GOLDENS,
                         ids=[c[0] for c in RIVER_GOLDENS])
def test_river_toponym_inflections(name, expected):
    from kglinker.kb.czech_morph import czech_location_inflections
    assert set(czech_location_inflections(name)) == expected


@pytest.mark.parametrize("name,expected", LOCATION_GOLDENS,
                         ids=[c[0] for c in LOCATION_GOLDENS])
def test_location_inflections(name, expected):
    from kglinker.kb.czech_morph import czech_location_inflections
    assert set(czech_location_inflections(name)) == expected


def test_generator_structural_properties():
    """Hypothesis properties over synthesized names: every emitted form is
    non-empty, differs from the nominative, preserves the word count, and
    keeps invariant tokens (prepositions, initials) byte-identical."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    syl = st.sampled_from(["ba", "ce", "di", "fo", "gu", "no", "vá", "řa"])
    surname = st.builds(lambda a, b, c, suf: (a + b + c).capitalize() + suf,
                        syl, syl, syl,
                        st.sampled_from(["k", "r", "š", "a", "ec", "ek",
                                         "ý", "ová", "á"]))
    given_name = st.sampled_from(["Jan", "Marie", "Tomáš", "Eva", "Karel",
                                  "Anna", "Jiří", "van", "J."])
    name_s = st.builds(lambda g, s: f"{g} {s}", given_name, surname)

    @settings(max_examples=150, deadline=None)
    @given(name_s, st.sampled_from(["M", "F", ""]))
    def prop(name, gender):
        forms = czech_name_inflections(name, gender)
        words = name.split(" ")
        for f in forms:
            assert f and f != name
            fw = f.split(" ")
            assert len(fw) == len(words)
            assert all(w2 for w2 in fw)
            for w0, w2 in zip(words, fw):
                if w0.endswith(".") or w0.lower() in ("van",):
                    assert w2 == w0          # invariant tokens untouched
                else:
                    # inflected words keep the original's first character
                    assert w2[0] == w0[0]
        # deterministic (lru_cache or not)
        assert czech_name_inflections(name, gender) == forms

    prop()


# r5 — opt-in vocative (reference namegen emits it via grammar_* files;
# our namelist default keeps it off so the r2-r4 surface set stays
# byte-stable). (name, gender, forms that vocative=True must ADD.)
VOCATIVE_GOLDENS: list[tuple[str, str, set[str]]] = [
    ("Jan Novák", "M", {"Jane Nováku"}),
    ("Petr Čapek", "M", {"Petře Čapku"}),
    ("Tomáš Němec", "M", {"Tomáši Němče"}),
    ("Karel Svoboda", "M", {"Karle Svobodo"}),
    ("Václav Havel", "M", {"Václave Havle"}),
    ("Eva Svobodová", "F", {"Evo Svobodová"}),
    # adjectival surname keeps nominative in the vocative
    ("Jiří Novotný", "M", set()),        # Jiří/Novotný both nominative
    ("Marie Sychravová", "F", set()),    # -e given + -ová: nominative
]


@pytest.mark.parametrize("name,gender,added", VOCATIVE_GOLDENS,
                         ids=[c[0] for c in VOCATIVE_GOLDENS])
def test_vocative_opt_in(name, gender, added):
    base = set(czech_name_inflections(name, gender))
    with_voc = set(czech_name_inflections(name, gender, vocative=True))
    assert with_voc - base == added
    # opt-out default is byte-stable
    assert czech_name_inflections(name, gender) == sorted(base)
