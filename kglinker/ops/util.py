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


def md5_bucket(col: F.Column) -> F.Column:
    """Deterministic 16-bit bucket of a key: ``int(md5(key)[:4], 16)``
    as a long in [0, 65536). ONE definition for every hash-bucket
    decision (stratified sampling, data-driven rates, packing shards) —
    the DuckDB twin is ``('0x' || substr(md5(key::VARCHAR), 1, 4))::INT``
    and any change here must change every oracle together."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4),
                  16, 10).cast("long")


def explode_token_ngrams(docs, n: int, keep: list[str], out: str = "g"):
    """(keep..., g): token n-grams built *inside the row* with an
    index-aware ``transform`` over the split array — no posexplode + window
    shuffle (the naive lead()-based plan shuffles every token; this one is
    a pure scan → explode, so n-gram construction stays shuffle-free at
    100 TB)."""
    arr = F.split(F.col("text"), " ")
    base = docs.select(*keep, arr.alias("_arr"))
    a = F.col("_arr")

    def gram(x, i):
        parts = [x] + [F.try_element_at(a, i + k + 1) for k in range(1, n)]
        return F.when(i <= F.size(a) - n, F.concat_ws(" ", *parts))

    return (base.select(*keep, F.explode(F.transform(a, gram)).alias(out))
            .filter(F.col(out).isNotNull()))
