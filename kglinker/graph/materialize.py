"""Graph materialization: fact/edge tables (north_star final stage).

Local sandbox writes parquet; the layout mirrors the intended Iceberg DDL
(comments) so the cluster version is a writer swap, not a redesign:

    CREATE TABLE kg.entities (entity_id string, entity_type string,
        kb_uri string, name string)
      USING iceberg PARTITIONED BY (entity_type)
    CREATE TABLE kg.edges (subj string, pred string, obj string,
        conv_id string, weight long)
      USING iceberg PARTITIONED BY (pred, bucket(64, subj))

Partitioning rationale at 10^12 turns: ``pred`` has 3 values with wildly
different cardinalities → partition by pred keeps dim lookups pruned;
``bucket(subj)`` spreads the Zipfian co-occurrence fan-in of hot entities
across files so no single file/manifest becomes the straggler.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_graph", "read_edges", "entity_table"]


def entity_table(kb_scored: DataFrame, canon: DataFrame | None = None) -> DataFrame:
    kb = kb_scored.select("kb_id", "type", "name", "wiki_url", "confidence")
    if canon is not None:
        kb = (kb.join(F.broadcast(canon), "kb_id", "left")
                .withColumn("entity_id",
                            F.coalesce("canon_id", "kb_id").cast("string"))
                .drop("canon_id"))
    else:
        kb = kb.withColumn("entity_id", F.col("kb_id").cast("string"))
    # canonical representative = the row whose kb_id == entity_id; fall back
    # to max confidence inside the component
    from pyspark.sql.window import Window
    w = Window.partitionBy("entity_id").orderBy(
        (F.col("kb_id").cast("string") != F.col("entity_id")).cast("int"),
        F.desc("confidence"), F.asc("kb_id"))
    return (kb.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("entity_id", F.col("type").alias("entity_type"),
                    F.col("wiki_url").alias("kb_uri"), "name"))


def write_graph(triples: DataFrame, entities: DataFrame, base: str) -> None:
    triples.write.mode("overwrite").partitionBy("pred").parquet(
        os.path.join(base, "edges"))
    entities.write.mode("overwrite").partitionBy("entity_type").parquet(
        os.path.join(base, "entities"))


def read_edges(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base, "edges"))
