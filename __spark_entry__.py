"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship KG query on the sf0.001 parquet (gazetteer link →
co-occurrence triples over ``documents``). ``queries``/``oracle_sql``:
the full registry from :mod:`kglinker.queries` — one entry per implemented
operator family of SURVEY.md §2 plus the training-data ops; every entry
except the per-conversation sequential pipeline (``kg_pipeline_*``,
deliberately non-SQL-expressible — SURVEY §2.6 D5/D7/D8) carries an exact
DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: entity-link sf0.001 documents against the gazetteer and
    emit (subj, pred, obj, weight) co-occurrence triples."""
    from pyspark.sql import functions as F

    from kglinker.ops.gazetteer_sql import doc_cooccurrence
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return (doc_cooccurrence(docs)
            .select(F.col("subj").cast("string").alias("subj"),
                    F.lit("co_occurs_in_doc").alias("pred"),
                    F.col("obj").cast("string").alias("obj"),
                    "weight"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kglinker.queries import QUERIES
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from kglinker.queries import QUERIES
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
