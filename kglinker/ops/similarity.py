"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — brute-force top-k: broadcast the (small) query set,
  one pass over the corpus, per-query window top-k. The correctness
  baseline; O(corpus × queries) but embarrassingly parallel and
  shuffle-light (only the final top-k shuffle, which is tiny after the
  per-partition ``row_number`` prune AQE applies).
- :func:`lsh_buckets` / :func:`lsh_topk` — sign-random-projection LSH:
  deterministic hyperplanes derived from md5 (reproducible across engines
  and runs, no RNG), bucket = sign bit-vector; candidates share the
  query's bucket → top-k within candidates. The 100 TB path: corpus is
  pre-bucketed once (write-time), each query touches one bucket.

Dot products run JVM-side via ``aggregate(zip_with(...))`` — no Python in
the hot loop. Scores are rounded to 4 dp and ranked on the rounded value
with ``vec_id`` tie-break so results are reproducible bit-for-bit across
engines (the DuckDB oracle ranks identically).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kglinker.ops.util import fround

__all__ = ["cosine_topk", "hyperplanes", "lsh_buckets", "lsh_topk",
           "cosine_pairs_same_label"]


def _dot(a: str, b: str) -> F.Column:
    return F.aggregate(F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: str) -> F.Column:
    return F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))


def _as_double(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """(query_id, vec_id, cos_sim) top-k neighbors per query (self excluded).
    Query side is broadcast; corpus side is scanned once."""
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    q = (e.filter(F.col("vec_id").isin([int(x) for x in query_ids]))
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv")))
    joined = (e.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id")))
    sim = fround(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (joined.withColumn("cos_sim", sim)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("query_id", "vec_id", "cos_sim"))


def hyperplanes(n_planes: int, dim: int, seed: str = "kglinker") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible with
    no RNG state, embeddable as literals in the SQL oracle."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append(int(h[:8], 16) / float(0xFFFFFFFF) - 0.5)
        planes.append(row)
    return planes


def lsh_buckets(emb: DataFrame, planes: list[list[float]]) -> DataFrame:
    """(vec_id, bucket): bucket = concatenated sign bits of plane dots."""
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    bits = []
    for row in planes:
        lit = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(F.zip_with(F.col("v"), lit, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return e.select("vec_id", F.concat(*bits).alias("bucket"), "v")


def lsh_topk(emb: DataFrame, query_ids: list[int], planes: list[list[float]],
             k: int = 5) -> DataFrame:
    """Bucketed ANN: candidates share the query's bucket. Recall < 1 by
    design; the bucket join replaces the cross join (corpus-scale path)."""
    b = lsh_buckets(emb, planes)
    q = (b.filter(F.col("vec_id").isin([int(x) for x in query_ids]))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("bucket").alias("qb"), F.col("v").alias("qv")))
    joined = (b.join(F.broadcast(q), (F.col("bucket") == F.col("qb"))
                     & (F.col("vec_id") != F.col("query_id"))))
    sim = fround(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (joined.withColumn("cos_sim", sim)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("query_id", "vec_id", "cos_sim"))


def _assign(e: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """argmax-centroid-cosine assignment against LITERAL centroid arrays —
    a pure projection, NO join/shuffle (fround ties → cent_id asc via an
    array_min over (−sim, cent_id) structs, same ordering as a
    row_number window)."""
    scored = []
    for cid in sorted(cents):
        lit = F.array(*[F.lit(float(x)) for x in cents[cid]])
        dot = F.aggregate(F.zip_with(F.col("v"), lit, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        nc = F.sqrt(F.aggregate(lit, F.lit(0.0), lambda acc, x: acc + x * x))
        sim = fround(dot / (_norm("v") * nc), 4)
        scored.append(F.struct((-sim).alias("negsim"),
                               F.lit(int(cid)).alias("cent_id")))
    best = F.array_min(F.array(*scored))
    return e.select("vec_id", "v", best["cent_id"].alias("cent_id"))


def ivf_assign(emb: DataFrame, n_centroids: int = 8,
               kmeans_iters: int = 2) -> DataFrame:
    """(vec_id, v, cent_id): IVF coarse quantization.

    Seeds = the first ``n_centroids`` vectors by vec_id (deterministic, no
    RNG), refined by ``kmeans_iters`` Lloyd iterations: assign → new
    centroid = per-dimension mean of the cluster, ROUNDED to 6 dp. The
    rounding is deliberate — it makes the refinement reproducible
    bit-for-bit across engines (the DuckDB oracle replays the same
    iterations), at a precision far below any quantization effect.

    Scale: centroids are driver-side state (n_centroids × dim doubles —
    the standard distributed k-means shape); each iteration is one
    shuffle-free literal-centroid assignment pass + one (cent_id, dim)
    aggregation + a tiny collect. Empty clusters keep their previous
    centroid."""
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    cents = {int(r["vec_id"]): list(r["v"]) for r in
             e.filter(F.col("vec_id") < n_centroids).collect()}
    for _ in range(kmeans_iters):
        assigned = _assign(e, cents)
        means = (assigned
                 .select("cent_id", F.posexplode("v").alias("dim", "val"))
                 .groupBy("cent_id", "dim")
                 .agg(fround(F.avg("val"), 6).alias("mv"))
                 .groupBy("cent_id")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("dim", "mv"))),
                     lambda s: s["mv"]).alias("cv")))
        got = {int(r["cent_id"]): list(r["cv"]) for r in means.collect()}
        cents = {cid: got.get(cid, cv) for cid, cv in cents.items()}
    return _assign(e, cents)


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_centroids: int = 8, kmeans_iters: int = 2) -> DataFrame:
    """IVF ANN: each query probes only its own centroid's inverted list —
    the corpus-scale path where the cross join is replaced by a bucket
    equijoin (recall < 1 by design, like any single-probe IVF)."""
    assign = ivf_assign(emb, n_centroids, kmeans_iters)
    q = (assign.filter(F.col("vec_id").isin([int(x) for x in query_ids]))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("cent_id").alias("qc"), F.col("v").alias("qv")))
    joined = assign.join(F.broadcast(q), (F.col("cent_id") == F.col("qc"))
                         & (F.col("vec_id") != F.col("query_id")))
    sim = fround(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (joined.withColumn("cos_sim", sim)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("query_id", "vec_id", "cos_sim"))


def lsh_neardup_pairs(emb: DataFrame, planes: list[list[float]],
                      threshold: float = 0.95) -> DataFrame:
    """Embedding near-dup pairs — the REGISTERED scale path: candidates
    come from a sign-random-projection bucket self-join (linear in corpus
    size, never all-pairs; a label-blocked all-pairs comparison would make
    a single popular label the whole corpus at 100 TB). Blocked-exact
    (:func:`cosine_pairs_same_label`) remains as the verification stage.
    Returns (vec_a, vec_b, cos_sim ≥ threshold), vec_a < vec_b."""
    b = lsh_buckets(emb, planes)
    a, c = b.alias("a"), b.alias("b")
    sim = fround(
        F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
                    F.lit(0.0), lambda acc, v: acc + v)
        / (F.sqrt(F.aggregate(F.col("a.v"), F.lit(0.0), lambda acc, v: acc + v * v))
           * F.sqrt(F.aggregate(F.col("b.v"), F.lit(0.0), lambda acc, v: acc + v * v))), 4)
    return (a.join(c, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .withColumn("cos_sim", sim)
            .filter(F.col("cos_sim") >= threshold)
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"), "cos_sim"))


def cosine_pairs_same_label(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding near-dup pairs within a label block — kept as the exact
    VERIFICATION stage over candidate blocks; the registered scale path
    is :func:`lsh_neardup_pairs` (bucketed candidates)."""
    e = emb.select("vec_id", "label", _as_double("embedding").alias("v"))
    a, b = e.alias("a"), e.alias("b")
    sim = fround(
        F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
                    F.lit(0.0), lambda acc, v: acc + v)
        / (F.sqrt(F.aggregate(F.col("a.v"), F.lit(0.0), lambda acc, v: acc + v * v))
           * F.sqrt(F.aggregate(F.col("b.v"), F.lit(0.0), lambda acc, v: acc + v * v))), 4)
    return (a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .withColumn("cos_sim", sim)
            .filter(F.col("cos_sim") >= threshold)
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"), "cos_sim"))
