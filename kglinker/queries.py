"""Query registry: every implemented operator exposed as a
(spark_callable, oracle_sql) pair for the driver contract
(``__spark_entry__.py``) and for ``bench.py``.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/values match the DuckDB oracle SQL exactly (floor-based
rounding, explicit orderings, md5-only hashing — see
:mod:`kglinker.ops.util`). Queries whose semantics are not
SQL-expressible (the per-conversation sequential disambiguation pipeline)
carry ``sql=None`` → the driver records a rows-only check and the pytest
oracle in ``tests/`` covers their correctness instead.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kglinker.ops.gazetteer_sql import (GAZETTEER, doc_components,
                                        doc_cooccurrence, doc_linked,
                                        doc_mentions)
from kglinker.ops.similarity import hyperplanes
from kglinker.ops.textstats import LANG_MARKERS, STOPWORDS
from kglinker.ops.util import fround, fround_sql

ANN_QUERY_IDS = [0, 1, 2]
ANN_K = 5
LSH_PLANES = hyperplanes(4, 64)
_ART_CACHE: dict = {}


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    headline: bool = False   # included in bench.py


# --------------------------------------------------------------------------
# shared SQL fragments
# --------------------------------------------------------------------------

_GAZ_VALUES = ", ".join(
    f"('{s}', CAST({k} AS BIGINT), CAST({c} AS DOUBLE), {len(s.split(' '))})"
    for s, k, c in GAZETTEER)

_SQL_TOKS = """
toks AS (
  SELECT doc_id, CAST(generate_subscripts(arr, 1) - 1 AS INTEGER) AS pos,
         unnest(arr) AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
)"""

_SQL_MENTIONS = f"""
gaz(surface, kb_id, confidence, n_words) AS (VALUES {_GAZ_VALUES}),
{_SQL_TOKS.strip()},
big AS (
  SELECT t.doc_id, t.pos,
         t.tok || ' ' || lead(t.tok) OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS surface
  FROM toks t
),
bigm AS (
  SELECT b.doc_id, b.pos, b.surface, g.kb_id, g.confidence
  FROM big b JOIN gaz g ON g.surface = b.surface AND g.n_words = 2
),
covered AS (
  SELECT doc_id, pos FROM bigm UNION SELECT doc_id, pos + 1 FROM bigm
),
unim AS (
  SELECT t.doc_id, t.pos, t.tok AS surface, g.kb_id, g.confidence
  FROM toks t JOIN gaz g ON g.surface = t.tok AND g.n_words = 1
  WHERE NOT EXISTS (SELECT 1 FROM covered c
                    WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
),
mentions AS (SELECT * FROM bigm UNION ALL SELECT * FROM unim)"""

_SQL_LINKED = f"""
{_SQL_MENTIONS},
linked AS (
  SELECT doc_id, pos, surface, kb_id
  FROM (SELECT m.*, row_number() OVER (PARTITION BY doc_id, pos
          ORDER BY confidence DESC, kb_id) AS rn FROM mentions m)
  WHERE rn = 1
)"""

_SQL_COOCCUR = f"""
{_SQL_LINKED},
ents AS (SELECT DISTINCT doc_id, kb_id FROM linked),
cooccur AS (
  SELECT a.kb_id AS subj, b.kb_id AS obj, count(*) AS weight
  FROM ents a JOIN ents b ON a.doc_id = b.doc_id AND a.kb_id < b.kb_id
  GROUP BY 1, 2
)"""


# --------------------------------------------------------------------------
# KG relational-parity queries (documents table)
# --------------------------------------------------------------------------

def q_kg_gazetteer_mentions(spark, sf_dir):
    return doc_mentions(_read(spark, sf_dir, "documents"))


def q_kg_linked_entities(spark, sf_dir):
    return doc_linked(_read(spark, sf_dir, "documents"))


def q_kg_cooccurrence_edges(spark, sf_dir):
    return doc_cooccurrence(_read(spark, sf_dir, "documents"))


def q_kg_connected_components(spark, sf_dir):
    return doc_components(_read(spark, sf_dir, "documents"))


SQL_KG_MENTIONS = f"WITH {_SQL_MENTIONS}\nSELECT doc_id, pos, surface, kb_id, confidence FROM mentions"
SQL_KG_LINKED = f"WITH {_SQL_LINKED}\nSELECT doc_id, pos, surface, kb_id FROM linked"
SQL_KG_COOCCUR = f"WITH {_SQL_COOCCUR}\nSELECT subj, obj, weight FROM cooccur"
def q_kg_entity_degree(spark, sf_dir):
    """Graph analytics over the materialized edges: weighted degree per
    canonical entity (undirected co-occurrence graph)."""
    co = doc_cooccurrence(_read(spark, sf_dir, "documents"))
    both = (co.select(F.col("subj").alias("node"), "weight")
            .unionByName(co.select(F.col("obj").alias("node"), "weight")))
    return (both.groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"),
                 F.sum("weight").alias("weighted_degree")))


SQL_KG_DEGREE = f"""WITH {_SQL_COOCCUR},
both_ends AS (
  SELECT subj AS node, weight FROM cooccur
  UNION ALL SELECT obj, weight FROM cooccur
)
SELECT node, count(*) AS degree,
       CAST(sum(weight) AS BIGINT) AS weighted_degree
FROM both_ends GROUP BY node"""


SQL_KG_CC = f"""WITH RECURSIVE {_SQL_COOCCUR},
und AS (SELECT subj AS src, obj AS dst FROM cooccur
        UNION SELECT obj, subj FROM cooccur),
closure(a, b) AS (
  SELECT src, dst FROM und
  UNION
  SELECT c.a, u.dst FROM closure c JOIN und u ON c.b = u.src
)
SELECT a AS node, least(a, min(b)) AS comp FROM closure GROUP BY a"""


# --------------------------------------------------------------------------
# KB-build parity queries (part table): A1-A4, K3, A5
# --------------------------------------------------------------------------

def q_kb_metric_scoring(spark, sf_dir):
    """A3/A4 scoring shape on the part table: per-type (brand) value/max
    normalization + weighted score (SURVEY §2.4)."""
    part = _read(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    np_ = F.least(F.col("p_retailprice") / F.max("p_retailprice").over(w), F.lit(1.0))
    ns = F.least(F.col("p_size") / F.max("p_size").over(w), F.lit(1.0))
    score = fround(F.lit(100.0) * (np_ * 5.0 + ns) / 6.0, 2)
    return part.select("p_partkey", "p_brand",
                       fround(np_, 4).alias("norm_price"),
                       fround(ns, 4).alias("norm_size"),
                       score.alias("score"))


SQL_KB_SCORING = f"""
SELECT p_partkey, p_brand,
       {fround_sql('least(p_retailprice / max(p_retailprice) OVER (PARTITION BY p_brand), 1.0)', 4)} AS norm_price,
       {fround_sql('least(p_size / max(p_size) OVER (PARTITION BY p_brand), 1.0)', 4)} AS norm_size,
       {fround_sql('100.0 * (least(p_retailprice / max(p_retailprice) OVER (PARTITION BY p_brand), 1.0) * 5.0 + least(p_size / max(p_size) OVER (PARTITION BY p_brand), 1.0)) / 6.0', 2)} AS score
FROM part"""


def q_namelist_groupmerge(spark, sf_dir):
    """A1 group-merge + A2 confidence-desc candidate ordering on part-name
    words (id list rendered as string for cross-engine hashing)."""
    part = _read(spark, sf_dir, "part")
    words = part.select(F.explode(F.split("p_name", " ")).alias("surface"),
                        "p_partkey", "p_retailprice")
    return (words.groupBy("surface")
            .agg(F.array_join(F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        (-F.col("p_retailprice")).alias("negconf"),
                        F.col("p_partkey").alias("id")))),
                    lambda s: s["id"].cast("string")), ",").alias("id_list"),
                 F.count(F.lit(1)).alias("n_ids")))


SQL_NAMELIST = """
SELECT surface,
       string_agg(CAST(p_partkey AS VARCHAR), ',' ORDER BY p_retailprice DESC, p_partkey) AS id_list,
       count(*) AS n_ids
FROM (SELECT unnest(string_split(p_name, ' ')) AS surface, p_partkey, p_retailprice FROM part)
GROUP BY surface"""


def q_kb_compare_match(spark, sf_dir):
    """K3 alias-candidate scoring + per-left argmax on part self-match
    (kb_compare.py:274-330 shape)."""
    part = _read(spark, sf_dir, "part")
    a, b = part.alias("a"), part.alias("b")
    score = ((F.col("a.p_brand") == F.col("b.p_brand")).cast("int")
             + (F.col("a.p_type") == F.col("b.p_type")).cast("int")
             + (F.col("a.p_size") == F.col("b.p_size")).cast("int"))
    pairs = (a.join(b, (F.col("a.p_name") == F.col("b.p_name"))
                    & (F.col("a.p_partkey") < F.col("b.p_partkey")))
             .select(F.col("a.p_partkey").alias("src_key"),
                     F.col("b.p_partkey").alias("dst_key"),
                     score.alias("match_score"))
             .filter(F.col("match_score") >= 1))
    w = Window.partitionBy("src_key").orderBy(F.desc("match_score"), F.asc("dst_key"))
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


SQL_KB_COMPARE = """
SELECT src_key, dst_key, match_score FROM (
  SELECT a.p_partkey AS src_key, b.p_partkey AS dst_key,
         (CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END
          + CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END
          + CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END) AS match_score,
         row_number() OVER (PARTITION BY a.p_partkey
           ORDER BY (CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END
                     + CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END
                     + CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END) DESC,
                    b.p_partkey) AS rn
  FROM part a JOIN part b ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey
  WHERE (CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END
         + CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END
         + CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END) >= 1
) WHERE rn = 1"""


def q_word_freq_ratio(spark, sf_dir):
    from kglinker.ops.textstats import word_freq_ratio
    return word_freq_ratio(_read(spark, sf_dir, "documents"))


SQL_WORD_FREQ = f"""
WITH freq AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY word
),
tot AS (SELECT lower(word) AS lw, sum(freq) AS tot FROM freq GROUP BY 1)
SELECT word, freq, {fround_sql('freq / tot', 4)} AS ratio
FROM freq JOIN tot ON lower(word) = lw"""


# --------------------------------------------------------------------------
# dedup queries (documents)
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    from kglinker.ops.dedup import exact_dedup_groups
    return exact_dedup_groups(_read(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1"""

_SQL_SHINGLES = """
shingles AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS g,
           lead(tok, 2) OVER w AS t2
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE t2 IS NOT NULL
)"""

_MINHASH_N = 8
_MINHASH_BANDS = 4
_SQL_SIG_COLS = ", ".join(
    f"min(md5('{i}:' || g)) AS h{i}" for i in range(_MINHASH_N))


def q_dedup_minhash_lsh(spark, sf_dir):
    from kglinker.ops.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_read(spark, sf_dir, "documents"),
                             num_hashes=_MINHASH_N, bands=_MINHASH_BANDS,
                             min_est=0.5)


_band_keys = []
_rpb = _MINHASH_N // _MINHASH_BANDS
for _b in range(_MINHASH_BANDS):
    _cols = " || '|' || ".join(f"h{_i}" for _i in range(_b * _rpb, (_b + 1) * _rpb))
    _band_keys.append(f"SELECT doc_id, {_b} AS band, {_cols} AS key FROM sig")
_SQL_BANDS = " UNION ALL ".join(_band_keys)
_SQL_EST = "(" + " + ".join(
    f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(_MINHASH_N)
) + f") / {float(_MINHASH_N)}"

SQL_DEDUP_MINHASH = f"""
WITH {_SQL_TOKS.strip()},
{_SQL_SHINGLES.strip()},
sig AS (SELECT doc_id, {_SQL_SIG_COLS} FROM shingles GROUP BY doc_id),
banded AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, est_sim FROM (
  SELECT c.doc_a, c.doc_b, {fround_sql(_SQL_EST, 4)} AS est_sim
  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a JOIN sig sb ON sb.doc_id = c.doc_b
) WHERE est_sim >= 0.5"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: minhash-LSH pairs → connected components →
    (doc_id, cluster_id, keep) where keep marks the per-cluster survivor
    (min doc_id) — the training-data dedup end product."""
    from kglinker.graph.canonicalize import connected_components
    from kglinker.ops.dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(_read(spark, sf_dir, "documents"),
                              num_hashes=_MINHASH_N, bands=_MINHASH_BANDS,
                              min_est=0.5)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")))
    return cc.select(F.col("node").alias("doc_id"),
                     F.col("comp").alias("cluster_id"),
                     (F.col("node") == F.col("comp")).alias("keep"))


_SQL_MINHASH_CAND = f"""
{_SQL_TOKS.strip()},
{_SQL_SHINGLES.strip()},
sig AS (SELECT doc_id, {_SQL_SIG_COLS} FROM shingles GROUP BY doc_id),
banded AS ({_SQL_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT c.doc_a, c.doc_b, {fround_sql(_SQL_EST, 4)} AS est_sim
    FROM cand c JOIN sig sa ON sa.doc_id = c.doc_a JOIN sig sb ON sb.doc_id = c.doc_b
  ) WHERE est_sim >= 0.5
)"""

SQL_DEDUP_CLUSTERS = f"""WITH RECURSIVE {_SQL_MINHASH_CAND},
und AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
closure(a, b) AS (
  SELECT src, dst FROM und
  UNION
  SELECT c.a, u.dst FROM closure c JOIN und u ON c.b = u.src
)
SELECT doc_id, cluster_id, doc_id = cluster_id AS keep FROM (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM closure GROUP BY a
)"""


def q_dedup_simhash(spark, sf_dir):
    from kglinker.ops.dedup import simhash_signatures
    return simhash_signatures(_read(spark, sf_dir, "documents"), bits=16)


_SQL_VOTES = ", ".join(
    f"sum(CASE WHEN substr(h, {j + 1}, 1) IN "
    f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{j}"
    for j in range(16))
_SQL_SIMBITS = " + ".join(
    f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16))

SQL_DEDUP_SIMHASH = f"""
WITH {_SQL_TOKS.strip()},
h AS (SELECT doc_id, md5(tok) AS h FROM toks),
v AS (SELECT doc_id, {_SQL_VOTES} FROM h GROUP BY doc_id)
SELECT doc_id, CAST({_SQL_SIMBITS} AS BIGINT) AS simhash FROM v"""


def q_dedup_ngram_jaccard(spark, sf_dir):
    from kglinker.ops.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_read(spark, sf_dir, "documents"), threshold=0.2)


SQL_DEDUP_JACCARD = f"""
WITH toks AS (
  SELECT doc_id, source, lang, generate_subscripts(arr, 1) - 1 AS pos, unnest(arr) AS tok
  FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS arr FROM documents)
),
grams AS (
  SELECT DISTINCT doc_id, source, lang, g FROM (
    SELECT doc_id, source, lang,
           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS g,
           lead(tok, 2) OVER w AS t2
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE t2 IS NOT NULL
),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM grams a JOIN grams b
    ON a.source = b.source AND a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT i.doc_a, i.doc_b,
         {fround_sql('n_inter / (sa.n_grams + sb.n_grams - n_inter)', 4)} AS jaccard
  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
) WHERE jaccard >= 0.2"""


# --------------------------------------------------------------------------
# similarity queries (embeddings)
# --------------------------------------------------------------------------

def q_ann_cosine_topk(spark, sf_dir):
    from kglinker.ops.similarity import cosine_topk
    return cosine_topk(_read(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, ANN_K)


_IDS = ", ".join(str(i) for i in ANN_QUERY_IDS)
SQL_ANN_COSINE = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id IN ({_IDS})),
s AS (SELECT q.qid AS query_id, e.vec_id,
             {fround_sql('list_cosine_similarity(e.v, q.qv)', 4)} AS cos_sim
      FROM e, q WHERE e.vec_id <> q.qid)
SELECT query_id, vec_id, cos_sim FROM (
  SELECT s.*, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rn FROM s
) WHERE rn <= {ANN_K}"""


def q_ann_lsh_topk(spark, sf_dir):
    from kglinker.ops.similarity import lsh_topk
    return lsh_topk(_read(spark, sf_dir, "embeddings"), ANN_QUERY_IDS,
                    LSH_PLANES, ANN_K)


def _plane_lit(row: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in row) + "]"


_SQL_BUCKET = " || ".join(
    f"(CASE WHEN list_cosine_similarity(v, {_plane_lit(p)}) >= 0 "
    f"THEN '1' ELSE '0' END)" for p in LSH_PLANES)

SQL_ANN_LSH = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
b AS (SELECT vec_id, v, {_SQL_BUCKET} AS bucket FROM e),
q AS (SELECT vec_id AS qid, bucket AS qb, v AS qv FROM b WHERE vec_id IN ({_IDS})),
s AS (SELECT q.qid AS query_id, b.vec_id,
             {fround_sql('list_cosine_similarity(b.v, q.qv)', 4)} AS cos_sim
      FROM b JOIN q ON b.bucket = q.qb AND b.vec_id <> q.qid)
SELECT query_id, vec_id, cos_sim FROM (
  SELECT s.*, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rn FROM s
) WHERE rn <= {ANN_K}"""


def q_ann_ivf_topk(spark, sf_dir):
    from kglinker.ops.similarity import ivf_topk
    return ivf_topk(_read(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, ANN_K)


SQL_ANN_IVF = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
asgn AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {fround_sql('list_cosine_similarity(e.v, c.cv)', 4)} DESC,
                      c.cent_id) AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, cent_id AS qc, v AS qv FROM asgn
      WHERE vec_id IN ({_IDS})),
s AS (SELECT q.query_id, a.vec_id,
             {fround_sql('list_cosine_similarity(a.v, q.qv)', 4)} AS cos_sim
      FROM asgn a JOIN q ON a.cent_id = q.qc AND a.vec_id <> q.query_id)
SELECT query_id, vec_id, cos_sim FROM (
  SELECT s.*, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rn FROM s
) WHERE rn <= {ANN_K}"""


def q_embed_neardup_pairs(spark, sf_dir):
    from kglinker.ops.similarity import cosine_pairs_same_label
    return cosine_pairs_same_label(_read(spark, sf_dir, "embeddings"),
                                   threshold=0.25)


SQL_EMBED_NEARDUP = f"""
WITH e AS (SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {fround_sql('list_cosine_similarity(a.v, b.v)', 4)} AS cos_sim
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
) WHERE cos_sim >= 0.25"""


# --------------------------------------------------------------------------
# text analysis queries (documents)
# --------------------------------------------------------------------------

def q_text_quality(spark, sf_dir):
    from kglinker.ops.textstats import text_quality
    return text_quality(_read(spark, sf_dir, "documents"))


_STOP_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)
SQL_TEXT_QUALITY = f"""
SELECT doc_id,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_chars_calc AS INTEGER) AS n_chars_calc,
       {fround_sql('(n_chars_calc - (n_tokens - 1)) / n_tokens', 4)} AS avg_token_len,
       {fround_sql('n_stop / n_tokens', 4)} AS stopword_ratio,
       {fround_sql('n_distinct / n_tokens', 4)} AS distinct_ratio,
       {fround_sql('least(n_tokens / 100.0, 1.0) * 0.4 + (n_stop / n_tokens) * 0.2 + (n_distinct / n_tokens) * 0.4', 4)} AS quality_score
FROM (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars_calc,
         len(list_filter(string_split(text, ' '),
             x -> list_contains([{_STOP_LIST}], x))) AS n_stop,
         len(list_distinct(string_split(text, ' '))) AS n_distinct
  FROM documents)"""


def q_lang_id(spark, sf_dir):
    from kglinker.ops.textstats import lang_id
    return lang_id(_read(spark, sf_dir, "documents"))


_MARKER_VALUES = ", ".join(
    f"('{lang}', '{m}')" for lang in sorted(LANG_MARKERS)
    for m in LANG_MARKERS[lang])
_LANG_VALUES = ", ".join(f"('{lang}')" for lang in sorted(LANG_MARKERS))
SQL_LANG_ID = f"""
WITH m(lang, marker) AS (VALUES {_MARKER_VALUES}),
langs(lang) AS (VALUES {_LANG_VALUES}),
{_SQL_TOKS.strip()},
cnt AS (SELECT t.doc_id, m.lang, count(*) AS c
        FROM toks t JOIN m ON t.tok = m.marker GROUP BY 1, 2),
allc AS (SELECT d.doc_id, l.lang, coalesce(c.c, 0) AS hits
         FROM (SELECT doc_id FROM documents) d
         CROSS JOIN langs l
         LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.lang = l.lang)
SELECT doc_id, lang AS predicted_lang, CAST(hits AS INTEGER) AS marker_hits FROM (
  SELECT allc.*, row_number() OVER (PARTITION BY doc_id
                                    ORDER BY hits DESC, lang) AS rn FROM allc
) WHERE rn = 1"""


def q_token_counts(spark, sf_dir):
    from kglinker.ops.textstats import token_counts
    return token_counts(_read(spark, sf_dir, "documents"))


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS alnum_tokens,
       CAST(strlen(text) AS INTEGER) AS byte_len
FROM documents"""


def q_doc_fingerprint(spark, sf_dir):
    from kglinker.ops.textstats import fingerprints
    return fingerprints(_read(spark, sf_dir, "documents"))


SQL_FINGERPRINT = f"""
WITH {_SQL_TOKS.strip()},
tri AS (
  SELECT doc_id, md5(g) AS h FROM (
    SELECT doc_id,
           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS g,
           lead(tok, 2) OVER w AS t2
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE t2 IS NOT NULL
)
SELECT doc_id, min(h) AS fingerprint FROM tri GROUP BY doc_id"""


# --------------------------------------------------------------------------
# events: streaming-compatible tumbling-window aggregation (batch form)
# --------------------------------------------------------------------------

def q_events_hourly(spark, sf_dir):
    ev = _read(spark, sf_dir, "events")
    return (ev.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
                "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 fround(F.sum("value"), 2).alias("total_value")))


SQL_EVENTS_HOURLY = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
       event_type, count(*) AS n_events,
       {fround_sql('sum(value)', 2)} AS total_value
FROM events GROUP BY 1, 2"""


# --------------------------------------------------------------------------
# multimodal plumbing (documents → binary column)
# --------------------------------------------------------------------------

def q_multimodal_metadata(spark, sf_dir):
    from kglinker.ops.multimodal import attach_blob, media_metadata
    return media_metadata(attach_blob(_read(spark, sf_dir, "documents")))


SQL_MM_META = """
SELECT doc_id, 'image/fake' AS mime, CAST(strlen(text) AS INTEGER) AS n_bytes
FROM documents"""


def q_multimodal_decode(spark, sf_dir):
    from kglinker.ops.multimodal import attach_blob, decode_media
    return decode_media(attach_blob(_read(spark, sf_dir, "documents")), fake=True)


_HEX_POS = "instr('0123456789abcdef', substr(md5(text), {j}, 1)) - 1"
_W_EXPR = (f"1 + (((({_HEX_POS.format(j=1)}) * 16 + ({_HEX_POS.format(j=2)})) * 16 "
           f"+ ({_HEX_POS.format(j=3)})) * 16 + ({_HEX_POS.format(j=4)})) % 512")
_H_EXPR = (f"1 + (((({_HEX_POS.format(j=5)}) * 16 + ({_HEX_POS.format(j=6)})) * 16 "
           f"+ ({_HEX_POS.format(j=7)})) * 16 + ({_HEX_POS.format(j=8)})) % 512")
SQL_MM_DECODE = f"""
SELECT doc_id, 'image/fake' AS mime,
       CAST(strlen(text) AS INTEGER) AS n_bytes,
       CAST({_W_EXPR} AS INTEGER) AS width,
       CAST({_H_EXPR} AS INTEGER) AS height,
       md5(text) AS feature_hash
FROM documents"""


# --------------------------------------------------------------------------
# full KG pipeline over synthesized transcripts. The sequential
# per-conversation semantics (SURVEY §2.6 D5/D7/D8) are not relationally
# expressible, so the DuckDB oracle reads PRECOMPUTED expected parquet
# produced by the INDEPENDENT oracle implementation
# (kglinker/oracle_matcher.py via kglinker/jobs/gen_expected.py) — a real
# two-implementation cross-check, not a re-expression.
# --------------------------------------------------------------------------

_PIPE_CONVS = 150
_EXPECTED_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "tests", "expected"))

SQL_PIPE_MENTIONS = f"""
SELECT conv_id, turn_idx, "start", "end", mention_type, surface, kb_id,
       resolved
FROM read_parquet('{_EXPECTED_DIR}/kg_pipeline_mentions.parquet')"""

SQL_PIPE_TRIPLES = f"""
SELECT subj, pred, obj, conv_id
FROM read_parquet('{_EXPECTED_DIR}/kg_pipeline_triples.parquet')"""


def _artifacts(spark):
    # keyed by a stable session token: id(spark) can be reused by CPython
    # after a stopped session is garbage-collected, which would hand back a
    # broadcast bound to a dead SparkContext
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime)
    if key not in _ART_CACHE:
        _ART_CACHE.clear()
        from kglinker.jobs.pipeline import build_kb_side
        _ART_CACHE[key] = build_kb_side(spark)
    return _ART_CACHE[key]


def q_kg_pipeline_mentions(spark, sf_dir):
    from kglinker.data.transcripts import transcripts_df
    from kglinker.extract.stage import extract_mentions
    _, art, _ = _artifacts(spark)
    return extract_mentions(transcripts_df(spark, _PIPE_CONVS), art)


def q_kg_pipeline_triples(spark, sf_dir):
    from kglinker.data.transcripts import transcripts_df
    from kglinker.extract.stage import extract_mentions
    from kglinker.graph.triples import build_triples
    kb_scored, art, canon = _artifacts(spark)
    mentions = extract_mentions(transcripts_df(spark, _PIPE_CONVS), art)
    return build_triples(mentions, kb_scored, canon).drop("weight")


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Query] = {
    # KG relational-parity (documents)
    "kg_gazetteer_mentions": Query(q_kg_gazetteer_mentions, SQL_KG_MENTIONS, True),
    "kg_linked_entities": Query(q_kg_linked_entities, SQL_KG_LINKED),
    "kg_cooccurrence_edges": Query(q_kg_cooccurrence_edges, SQL_KG_COOCCUR, True),
    "kg_connected_components": Query(q_kg_connected_components, SQL_KG_CC),
    "kg_entity_degree": Query(q_kg_entity_degree, SQL_KG_DEGREE),
    # KB-build parity (part/documents)
    "kb_metric_scoring": Query(q_kb_metric_scoring, SQL_KB_SCORING),
    "namelist_groupmerge": Query(q_namelist_groupmerge, SQL_NAMELIST),
    "kb_compare_match": Query(q_kb_compare_match, SQL_KB_COMPARE),
    "word_freq_ratio": Query(q_word_freq_ratio, SQL_WORD_FREQ),
    # dedup
    "dedup_exact": Query(q_dedup_exact, SQL_DEDUP_EXACT, True),
    "dedup_minhash_lsh": Query(q_dedup_minhash_lsh, SQL_DEDUP_MINHASH, True),
    "dedup_simhash": Query(q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "dedup_clusters": Query(q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_ngram_jaccard": Query(q_dedup_ngram_jaccard, SQL_DEDUP_JACCARD),
    # similarity
    "ann_cosine_topk": Query(q_ann_cosine_topk, SQL_ANN_COSINE, True),
    "ann_lsh_topk": Query(q_ann_lsh_topk, SQL_ANN_LSH),
    "ann_ivf_topk": Query(q_ann_ivf_topk, SQL_ANN_IVF),
    "embed_neardup_pairs": Query(q_embed_neardup_pairs, SQL_EMBED_NEARDUP),
    # text analysis
    "text_quality": Query(q_text_quality, SQL_TEXT_QUALITY, True),
    "lang_id": Query(q_lang_id, SQL_LANG_ID),
    "token_counts": Query(q_token_counts, SQL_TOKEN_COUNTS),
    "doc_fingerprint": Query(q_doc_fingerprint, SQL_FINGERPRINT),
    # events / streaming-shaped
    "events_hourly": Query(q_events_hourly, SQL_EVENTS_HOURLY),
    # multimodal plumbing
    "multimodal_metadata": Query(q_multimodal_metadata, SQL_MM_META),
    "multimodal_decode": Query(q_multimodal_decode, SQL_MM_DECODE),
    # full pipeline — oracled against independent-implementation parquet
    "kg_pipeline_mentions": Query(q_kg_pipeline_mentions, SQL_PIPE_MENTIONS, True),
    "kg_pipeline_triples": Query(q_kg_pipeline_triples, SQL_PIPE_TRIPLES, True),
}
