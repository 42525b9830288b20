"""Deterministic synthetic knowledge base.

Shape mirrors the reference KB row model — one row per entity, 1-based
``kb_id`` = TSV line number (``/root/reference/metrics_knowledge_base.py:191-197``),
``|``-delimited multi-value cells (``ner_knowledge_base.py:23``), per-type
attribute columns parsed from HEAD-KB (``metrics_knowledge_base.py:45-103``).
Content is hand-built (no RNG) and exercises every fixture requirement of
FIXTURES.md §2:

- ambiguous surface across types: person "George Washington" / settlement
  "Washington" (the ``ner_cz.py:292-297`` example),
- persons sharing a surname ("Jan Novák" / "Petr Novák") → fragment coref,
- alias/redirect duplicates across two kb rows ("Praha" on kb 12 & 13) →
  canonicalization / connected-components merge case,
- ``van`` / ``O'`` prefixed names (``library/entities/Persons.py:31-34``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["KB_ROWS", "KB_SCHEMA", "kb_df", "kb_rows_as_dicts"]

KB_COLUMNS = [
    "kb_id", "type", "name", "disambiguation_name", "aliases", "redirects",
    "description", "gender", "date_of_birth", "date_of_death", "jobs",
    "nationality", "location", "country", "source_loc", "founded",
    "cancelled", "start", "end", "wiki_url",
    "wiki_backlinks", "wiki_hits", "wiki_ps",
]

# (kb_id, type, name, disambig, aliases, redirects, description, gender,
#  dob, dod, jobs, nationality, location, country, source_loc,
#  founded, cancelled, start, end, wiki_url, backlinks, hits, ps)
KB_ROWS: list[tuple] = [
    # --- persons -----------------------------------------------------------
    (1, "person", "Tomáš Garrigue Masaryk", "Tomáš Garrigue Masaryk (president)",
     "T. G. Masaryk|TGM", "Masaryk Tomáš",
     "First president of Czechoslovakia, philosopher and statesman.",
     "M", "1850-03-07", "1937-09-14", "politician|philosopher", "Czech",
     "", "", "", "", "", "", "", "https://wiki.example/Tomas_Garrigue_Masaryk",
     5200, 91000, 340),
    (2, "person", "George Washington", "George Washington (president)",
     "", "Washington George",
     "First president of the United States, commander of the Continental Army.",
     "M", "1732-02-22", "1799-12-14", "politician|general", "American",
     "", "", "", "", "", "", "", "https://wiki.example/George_Washington",
     9800, 250000, 510),
    (3, "person", "Johann Gottfried Bernhard Bach", "Johann Gottfried Bernhard Bach (organist)",
     "", "", "German organist, son of Johann Sebastian Bach.",
     "M", "1715-05-11", "1739-05-27", "organist|musician", "German",
     "", "", "", "", "", "", "", "https://wiki.example/J_G_B_Bach",
     120, 3400, 25),
    (4, "person", "Ludwig van Beethoven", "Ludwig van Beethoven (composer)",
     "Beethoven#ntype=nick", "",
     "German composer and pianist of the transition from classical to romantic.",
     "M", "1770-12-17", "1827-03-26", "composer|pianist", "German",
     "", "", "", "", "", "", "", "https://wiki.example/Ludwig_van_Beethoven",
     8700, 198000, 480),
    (5, "person", "Flannery O'Connor", "Flannery O'Connor (writer)",
     "", "", "American novelist and short story writer from Georgia.",
     "F", "1925-03-25", "1964-08-03", "writer", "American",
     "", "", "", "", "", "", "", "https://wiki.example/Flannery_OConnor",
     830, 21000, 95),
    (6, "person", "Jan Novák", "Jan Novák (composer)",
     "", "", "Czech composer of the twentieth century.",
     "M", "1921-04-08", "1984-11-17", "composer", "Czech",
     "", "", "", "", "", "", "", "https://wiki.example/Jan_Novak_composer",
     210, 5600, 31),
    (7, "person", "Petr Novák", "Petr Novák (singer)",
     "", "", "Czech rock singer and guitarist.",
     "M", "1945-09-06", "1997-08-19", "singer|musician", "Czech",
     "", "", "", "", "", "", "", "https://wiki.example/Petr_Novak_singer",
     180, 4900, 28),
    (8, "person", "Marie Curie", "Marie Curie (physicist)",
     "Maria Skłodowska#lang=pl", "",
     "Polish-French physicist and chemist, pioneer of radioactivity research.",
     "F", "1867-11-07", "1934-07-04", "physicist|chemist", "Polish|French",
     "", "", "", "", "", "", "", "https://wiki.example/Marie_Curie",
     7600, 176000, 450),
    (9, "person:fictional", "Josef Švejk", "Josef Švejk (character)",
     "Švejk", "", "Fictional Czech soldier from the novel by Jaroslav Hašek.",
     "M", "", "", "soldier", "Czech",
     "", "", "", "", "", "", "", "https://wiki.example/Josef_Svejk",
     410, 12000, 66),
    # --- organisations (tool-name hot keys) --------------------------------
    (10, "organisation", "Apache Spark", "Apache Spark (software)",
     "Spark", "", "Distributed analytics engine for large-scale data processing.",
     "", "", "", "", "", "Berkeley", "United States", "",
     "2009-00-00", "", "", "", "https://wiki.example/Apache_Spark",
     3100, 87000, 210),
    (11, "organisation", "SearchTool", "SearchTool (service)",
     "", "", "Web search service used by agent transcripts.",
     "", "", "", "", "", "Prague", "Czechia", "",
     "2015-00-00", "", "", "", "https://wiki.example/SearchTool",
     90, 2400, 12),
    # --- settlements (alias duplicate pair → CC merge case) -----------------
    (12, "settlement", "Prague", "Prague (capital)",
     "Praha", "", "Capital city of Czechia on the Vltava river.",
     "", "", "", "", "", "", "Czechia", "",
     "", "", "", "", "https://wiki.example/Prague",
     4400, 132000, 260),
    (13, "settlement", "Praha", "Praha (duplicate import)",
     "Prague", "", "Capital of Czechia (duplicate KB import row).",
     "", "", "", "", "", "", "Czechia", "",
     "", "", "", "", "https://wiki.example/Prague",
     60, 900, 8),
    (14, "settlement", "Washington", "Washington (city)",
     "Washington, D.C.", "",
     "Washington is the capital city of the United States of America.",
     "", "", "", "", "", "", "United States", "",
     "", "", "", "", "https://wiki.example/Washington_DC",
     5100, 141000, 300),
    (15, "settlement", "Brno", "Brno (city)",
     "", "", "Second largest city of Czechia, seat of Masaryk University.",
     "", "", "", "", "", "", "Czechia", "",
     "", "", "", "", "https://wiki.example/Brno",
     980, 34000, 120),
    # --- countries ----------------------------------------------------------
    (16, "country", "Czechia", "Czechia (country)",
     "Czech Republic", "", "Country in central Europe, capital Prague.",
     "", "", "", "", "", "", "", "",
     "1993-01-01", "", "", "", "https://wiki.example/Czechia",
     6200, 158000, 330),
    (17, "country", "Germany", "Germany (country)",
     "", "", "Country in central Europe, most populous EU member state.",
     "", "", "", "", "", "", "", "",
     "", "", "", "", "https://wiki.example/Germany",
     8900, 240000, 470),
    (18, "country", "United States", "United States (country)",
     "United States of America|USA", "",
     "Country in North America consisting of fifty states.",
     "", "", "", "", "", "", "", "",
     "1776-07-04", "", "", "", "https://wiki.example/United_States",
     9900, 310000, 520),
    # --- watercourses -------------------------------------------------------
    (19, "watercourse", "Vltava", "Vltava (river)",
     "", "", "Longest river of Czechia, flows through Prague.",
     "", "", "", "", "", "", "", "Šumava",
     "", "", "", "", "https://wiki.example/Vltava",
     720, 19000, 80),
    (20, "watercourse", "Danube", "Danube (river)",
     "", "", "Second longest river in Europe, flows through ten countries.",
     "", "", "", "", "", "", "", "Black Forest",
     "", "", "", "", "https://wiki.example/Danube",
     2600, 64000, 190),
    # --- events -------------------------------------------------------------
    (21, "event", "Battle of Austerlitz", "Battle of Austerlitz (1805)",
     "Battle of the Three Emperors|Austerlitz", "",
     "Napoleonic battle fought near Brno in Moravia.",
     "", "", "", "", "", "", "", "",
     "", "", "1805-12-02", "1805-12-02", "https://wiki.example/Austerlitz",
     1400, 28000, 105),
    (22, "event", "Prague Spring", "Prague Spring (1968)",
     "", "", "Period of political liberalization in Czechoslovakia.",
     "", "", "", "", "", "", "", "",
     "", "", "1968-01-05", "1968-08-21", "https://wiki.example/Prague_Spring",
     1900, 41000, 130),
    # event/settlement ambiguous surface "Austerlitz" → exercises the D2
    # context-free filter (" during " left context keeps event senses,
    # ner_cz.py:279-297)
    (23, "settlement", "Austerlitz", "Austerlitz (town)",
     "Battle of Austerlitz#ntype=nick", "",
     "Town in Moravia known for the Napoleonic battle.",
     "", "", "", "", "", "", "Czechia", "",
     "", "", "", "", "https://wiki.example/Austerlitz_town",
     300, 9000, 40),
    # r4 location paradigms through the driver gates: soft-final feminine
    # (Olomouc), -ec fleeting-e (Liberec), "X nad Y" river toponym (Ústí)
    (24, "settlement", "Olomouc", "Olomouc (city)",
     "", "", "Moravian city on the Morava river.",
     "", "", "", "", "", "", "Czechia", "",
     "", "", "", "", "https://wiki.example/Olomouc",
     800, 21000, 60),
    (25, "settlement", "Liberec", "Liberec (city)",
     "", "", "City under the Jizera mountains.",
     "", "", "", "", "", "", "Czechia", "",
     "", "", "", "", "https://wiki.example/Liberec",
     700, 18000, 55),
    (26, "settlement", "Ústí nad Labem", "Ústí nad Labem (city)",
     "Ústí", "", "City at the confluence of the Labe and Bílina rivers.",
     "", "", "", "", "", "", "Czechia", "",
     "", "", "", "", "https://wiki.example/Usti_nad_Labem",
     600, 15000, 50),
    # r5 G8-tail rows: fem i-stem ď/ť final (kost-class exonym) and the
    # -j final (gender-shared subset) push the new paradigms through the
    # namelist gate end-to-end
    (27, "settlement", "Budapešť", "Budapešť (city)",
     "", "", "Capital of Hungary on the Danube.",
     "", "", "", "", "", "", "Hungary", "",
     "", "", "", "", "https://wiki.example/Budapest",
     900, 24000, 58),
    (28, "settlement", "Hanoj", "Hanoj (city)",
     "", "", "Capital of Vietnam on the Red River.",
     "", "", "", "", "", "", "Vietnam", "",
     "", "", "", "", "https://wiki.example/Hanoi",
     500, 12000, 45),
    # r6 G2 row: a Svatý-named person pushes the saint cross-rewrites
    # (Svatý/Sv./Sv — KB2namelist.py:283-290) through the namelist gate
    (29, "person", "Svatý Václav", "Svatý Václav (duke)",
     "", "", "Patron saint of Bohemia, duke of the Přemyslid dynasty.",
     "M", "0907-01-01", "0935-09-28", "duke|patron saint", "Czech",
     "", "", "", "", "", "", "", "https://wiki.example/Svaty_Vaclav",
     1100, 26000, 95),
]

_FIELDS = [
    T.StructField("kb_id", T.LongType(), False),
    T.StructField("type", T.StringType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("disambiguation_name", T.StringType(), True),
    T.StructField("aliases", T.StringType(), True),
    T.StructField("redirects", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("gender", T.StringType(), True),
    T.StructField("date_of_birth", T.StringType(), True),
    T.StructField("date_of_death", T.StringType(), True),
    T.StructField("jobs", T.StringType(), True),
    T.StructField("nationality", T.StringType(), True),
    T.StructField("location", T.StringType(), True),
    T.StructField("country", T.StringType(), True),
    T.StructField("source_loc", T.StringType(), True),
    T.StructField("founded", T.StringType(), True),
    T.StructField("cancelled", T.StringType(), True),
    T.StructField("start", T.StringType(), True),
    T.StructField("end", T.StringType(), True),
    T.StructField("wiki_url", T.StringType(), True),
    T.StructField("wiki_backlinks", T.LongType(), True),
    T.StructField("wiki_hits", T.LongType(), True),
    T.StructField("wiki_ps", T.LongType(), True),
]
KB_SCHEMA = T.StructType(_FIELDS)


def kb_rows_as_dicts() -> list[dict]:
    return [dict(zip(KB_COLUMNS, r)) for r in KB_ROWS]


def kb_df(spark: SparkSession) -> DataFrame:
    """The synthetic KB as a DataFrame (the S1 scan of SURVEY §2.1 —
    ``kb_id`` is pre-assigned so no ``row_number`` shuffle is needed)."""
    return spark.createDataFrame(KB_ROWS, KB_SCHEMA)
