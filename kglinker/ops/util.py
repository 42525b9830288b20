"""Cross-engine numeric helpers.

``fround`` is floor-based fixed-point truncation: unlike ``round`` (Spark
HALF_UP vs DuckDB HALF_EVEN), ``floor(x * 10^d) / 10^d`` is bit-identical
across engines, which the driver's value-hash comparison requires.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def fround(col: F.Column, digits: int = 4) -> F.Column:
    scale = float(10 ** digits)
    return F.floor(col * F.lit(scale)) / F.lit(scale)


def fround_sql(expr: str, digits: int = 4) -> str:
    scale = 10 ** digits
    return f"floor(({expr}) * {scale}) / {scale}.0"
