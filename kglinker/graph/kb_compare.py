"""Two-KB comparison & merge — the reference's standalone KnowBase tool
(``/root/reference/NER/KnowBase/kb_compare.py``) re-expressed relationally.

Reference flow → here:

- **unique relations** (``match_by_unique``, kb_compare.py:332-346): a
  shared non-empty unique-id value (e.g. wiki url) links a kb1 row to a
  kb2 row outright, each kb2 row used at most once.
- **name relations** (``match_by_name``, :347-363): candidate kb2 rows
  accumulate ``weight += 1`` per shared name/alias VALUE across the
  configured field pairs; the best candidate with ``weight ≥ threshold``
  matches (:300-330).
- **one-to-one**: the reference walks kb1 in file order marking
  candidates ``used``; distributed re-expression: per-kb1 argmax (desc
  weight, asc kb2 id) followed by per-kb2 argmax over those picks (desc
  weight, asc kb1 id) — deterministic mutual-best instead of
  sequential-greedy (documented deviation: ties resolve by id, not file
  order; unique-id matches always take precedence).
- **merged output** (``Output.make_output``, :423-505): matched pairs
  emit per-field merged rows (kb1 primary, kb2 fills empties; multi-valued
  fields union), unmatched kb1 AND kb2 rows are appended.

Scale: both KBs are small sides; every join is value-keyed (shared
surfaces / unique ids), never cross. The merge is one groupBy over
matched pairs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["MatchConfig", "match_two_kbs", "merge_two_kbs"]


@dataclass
class MatchConfig:
    """Relation configuration (the reference's *.fields + relations files).
    Field names are column names present in both KBs (or map pairs)."""
    unique_fields: tuple = ("wiki_url",)
    # (kb1_field, kb2_field) pairs whose shared values score +1 each
    name_relations: tuple = (("name", "name"), ("name", "aliases"),
                             ("aliases", "name"), ("aliases", "aliases"))
    threshold: int = 1
    multi_delim: str = "|"
    multi_fields: tuple = ("aliases", "redirects", "jobs", "nationality")
    id_col: str = "kb_id"


def _values(kb: DataFrame, col: str, cfg: MatchConfig, out: str) -> DataFrame:
    """(id, value) pairs for a field; multi-valued fields explode on the
    delimiter; empty values dropped."""
    c = F.coalesce(F.col(col).cast("string"), F.lit(""))
    if col in cfg.multi_fields:
        vals = F.explode(F.split(c, r"\|"))
    else:
        vals = c
    return (kb.select(F.col(cfg.id_col).alias(out), vals.alias("value"))
            .filter(F.col("value") != ""))


def match_two_kbs(kb1: DataFrame, kb2: DataFrame,
                  cfg: MatchConfig = MatchConfig()) -> DataFrame:
    """(id1, id2, weight, via) matched pairs; ``via`` is 'unique' or
    'name'. One-to-one on both sides; unique-id links take precedence."""
    # unique-id links (weight sentinel far above any name-hit count)
    uniq = None
    for col in cfg.unique_fields:
        u1 = _values(kb1, col, cfg, "id1")
        u2 = _values(kb2, col, cfg, "id2")
        pairs = u1.join(u2, "value").select("id1", "id2").distinct()
        uniq = pairs if uniq is None else uniq.unionByName(pairs).distinct()
    uniq = (uniq.withColumn("weight", F.lit(1_000_000))
            .withColumn("via", F.lit("unique")))

    # name-relation candidate weights: +1 per shared (relation, value)
    cands = None
    for f1, f2 in cfg.name_relations:
        v1 = _values(kb1, f1, cfg, "id1")
        v2 = _values(kb2, f2, cfg, "id2")
        hit = v1.join(v2, "value").select("id1", "id2")
        cands = hit if cands is None else cands.unionByName(hit)
    named = (cands.groupBy("id1", "id2")
             .agg(F.count(F.lit(1)).alias("weight"))
             .filter(F.col("weight") >= cfg.threshold)
             .withColumn("via", F.lit("name")))

    allc = uniq.unionByName(named)
    # per-kb1 best candidate, then per-kb2 best of those picks (mutual
    # best = deterministic one-to-one)
    w1 = Window.partitionBy("id1").orderBy(F.desc("weight"), F.asc("id2"),
                                           F.asc("via"))
    picked = (allc.withColumn("_r", F.row_number().over(w1))
              .filter(F.col("_r") == 1).drop("_r"))
    w2 = Window.partitionBy("id2").orderBy(F.desc("weight"), F.asc("id1"),
                                           F.asc("via"))
    return (picked.withColumn("_r", F.row_number().over(w2))
            .filter(F.col("_r") == 1).drop("_r"))


def merge_two_kbs(kb1: DataFrame, kb2: DataFrame,
                  cfg: MatchConfig = MatchConfig(),
                  matches: DataFrame | None = None) -> DataFrame:
    """Combined KB: matched pairs merged per-field (kb1 primary, kb2
    fills empty single-valued fields, multi-valued union), unmatched rows
    from BOTH sides appended. Output ids: kb1 ids, kb2 ids offset above
    max(kb1 id) (the reference regenerates ids with a prefix+hash;
    a deterministic offset keeps them stable and collision-free)."""
    if matches is None:
        matches = match_two_kbs(kb1, kb2, cfg)
    m = matches.select("id1", "id2")
    shift = (kb1.agg(F.max(cfg.id_col)).collect()[0][0] or 0)
    attrs = [c for c in kb1.columns if c != cfg.id_col and c in kb2.columns]

    j = (kb1.join(F.broadcast(m), kb1[cfg.id_col] == m.id1, "left"))
    two = kb2.select(*([F.col(cfg.id_col).alias("_id2")]
                       + [F.col(c).alias(f"_b_{c}") for c in attrs]))
    j = j.join(F.broadcast(two), j.id2 == two._id2, "left")

    def mrg(c: str) -> F.Column:
        a, b = F.col(c), F.col(f"_b_{c}")
        if c in cfg.multi_fields:
            arr = F.array_distinct(F.filter(
                F.concat(F.split(F.coalesce(a.cast("string"), F.lit("")), r"\|"),
                         F.split(F.coalesce(b.cast("string"), F.lit("")), r"\|")),
                lambda x: x != ""))
            return F.array_join(arr, cfg.multi_delim).alias(c)
        return F.coalesce(
            F.when(a.cast("string") != "", a), b, a).alias(c)

    merged_kb1 = j.select(F.col(cfg.id_col), *[mrg(c) for c in attrs])
    unmatched_kb2 = (kb2.join(F.broadcast(m.select(F.col("id2").alias(cfg.id_col))),
                              cfg.id_col, "left_anti")
                     .select((F.col(cfg.id_col) + F.lit(shift)).alias(cfg.id_col),
                             *attrs))
    return merged_kb1.unionByName(unmatched_kb2)
