"""Small word lists mirroring the reference's dictionary-build inputs
(FIXTURES.md §6; reference files ``figa/make_automat/stop_list``,
``allow_list``, ``narodnosti.txt``, ``freq_terms_filtred.all``).
"""

from __future__ import annotations

# Stoplisted surfaces are demoted to fragment-only namelist entries
# (uniq_namelist.py:33-39, :101-111); expanded by capitalization variants
# (create_cedar.sh:158-165).
STOPLIST = ["spark", "The", "Data"]

# Allowlisted surfaces bypass the P2 unsuitable-form filters (KB2namelist.py:210).
ALLOWLIST = ["US"]

# Nationality adjectives; each expands to 4 variants (±'ý' suffix, ±lowercase)
# per natToKB.py:12-30. Mentions matching these with no KB senses become
# context-only nationality tokens (ner_cz.py:1602-1608).
NATIONALITIES = ["Czech", "German", "American", "Polish", "French"]

# Titles/degrees stripped from name heads/tails (KB2namelist.py:366-374).
TITLES = ["Sir", "Jr.", "Dr.", "prof."]

# Pronoun surfaces inserted with fragment sentinel (KB2namelist.py:581-587);
# consumed as sense 0 = coref marker (ner_cz.py:216-217). Masculine/feminine
# split drives D8 pronoun coreference (ner_cz.py:411-491).
PRONOUNS_MALE = ["on", "ho", "mu", "něm", "jím"]
PRONOUNS_FEMALE = ["ona", "jí", "ní"]
PRONOUNS = PRONOUNS_MALE + PRONOUNS_FEMALE

# Name prepositions normalized during subname extraction (Persons.py:42-58).
NAME_PREPOSITIONS = {"van", "von", "de", "da", "del", "di", "la", "le", "z", "ze"}

# Czech month names, genitive + nominative → month number (dates.py:225-238).
CZECH_MONTHS = {
    "ledna": 1, "leden": 1, "února": 2, "únor": 2, "března": 3, "březen": 3,
    "dubna": 4, "duben": 4, "května": 5, "květen": 5, "června": 6, "červen": 6,
    "července": 7, "červenec": 7, "srpna": 8, "srpen": 8, "září": 9,
    "října": 10, "říjen": 10, "listopadu": 11, "listopad": 11,
    "prosince": 12, "prosinec": 12,
}

# G8 Czech morphological inflection fixture corpus (SURVEY §7.5): the real
# generator is the reference's 815-LoC grammar system
# (figa/make_automat/czechnames/namegen.py, invoked create_cedar.sh:136-142);
# until it is ported, the namelist build consumes this hand-checked corpus
# of oblique-case forms (genitive/dative/accusative/locative/instrumental)
# for the fixture persons. Extend per KB snapshot.
CZECH_INFLECTIONS: dict[str, list[str]] = {
    "Jan Novák": [
        "Jana Nováka", "Janu Novákovi", "Janovi Novákovi", "Janem Novákem",
    ],
    "Petr Novák": [
        "Petra Nováka", "Petru Novákovi", "Petrovi Novákovi",
        "Petrem Novákem",
    ],
    "Tomáš Garrigue Masaryk": [
        "Tomáše Garrigua Masaryka", "Tomáši Garriguovi Masarykovi",
        "Tomášem Garriguem Masarykem",
    ],
    "Josef Švejk": [
        "Josefa Švejka", "Josefu Švejkovi", "Josefem Švejkem",
    ],
    "Marie Curie": [
        "Marii Curie", "Marií Curie",
    ],
    "Ludwig van Beethoven": [
        "Ludwiga van Beethovena", "Ludwigu van Beethovenovi",
        "Ludwigem van Beethovenem",
    ],
    "George Washington": [
        "George Washingtona", "Georgi Washingtonovi", "Georgem Washingtonem",
    ],
    "Johann Gottfried Bernhard Bach": [
        "Johanna Gottfrieda Bernharda Bacha",
        "Johannem Gottfriedem Bernhardem Bachem",
    ],
    "Flannery O'Connor": [
        "Flannery O'Connorová", "Flannery O'Connorové",
    ],
}
