"""Deterministic 10× scale-up of the sf0.1 test tables → an "sf1" dir.

The driver ships sf{0.001,0.01,0.1} only; the full-headline scale-growth
row (r4 verdict #8) needs the documents/embeddings/events tables one
order of magnitude up. This synthesizes them deterministically from
sf0.1 — K shifted copies (doc/event ids offset per copy), written
multi-partition so scans parallelize — and copies the small TPC-H
tables through unchanged. No external data, no RNG.

Copies must not be EXACT replicas (r5 review fix): 10 identical text
copies would put every doc in a 10-way duplicate group, inflating the
dedup queries' candidate-pair stages ~quadratically and turning the
"growth for 10× data" rows into duplicate pathology instead of
representative scaling. So copy i > 0 renames the token space
(``tok`` → ``tok·i``) — intra-copy similarity structure is preserved
EXACTLY (a bijection on tokens preserves every Jaccard) while copies
share no shingles — and flips embedding dimensions by a deterministic
per-(copy, dim) sign pattern, which preserves intra-copy cosines
exactly (signs square away) while decorrelating cross-copy pairs.
Copy 0 stays byte-identical to the source, so sf0.1 ⊂ sf1.

    PYTHONPATH=/root/repo python -m kglinker.jobs.gen_scaled \
        [/root/testdata/sf0.1] [/tmp/kgl_sf1] [10]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

_COPY_TABLES = ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem"]
_ID_OFFSET = 10_000_000


def main() -> None:
    from kglinker.runtime.session import get_spark
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kgl_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("kgl-gen-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    def scaled(table: str, *id_cols: str) -> None:
        base = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        out = None
        for i in range(k):
            c = base
            for id_col in id_cols:
                c = c.withColumn(id_col,
                                 F.col(id_col) + F.lit(i * _ID_OFFSET))
            if i > 0 and "text" in c.columns:
                # rename the token space per copy: Jaccard-preserving
                # within the copy, (nearly) zero shared shingles across
                # copies. Gazetteer vocabulary is EXEMPT so the kg_*
                # queries find entities in every copy (downstream
                # extraction/graph stages see 10× mentions, not 1×);
                # a cross-copy trigram shingle then needs three
                # consecutive gazetteer words — rare enough that copies
                # stay far below every near-dup threshold.
                from kglinker.ops.gazetteer_sql import GAZETTEER
                keep = sorted({w for s, _, _ in GAZETTEER
                               for w in s.split(" ")})
                keep_arr = F.array(*[F.lit(w) for w in keep])
                c = c.withColumn(
                    "text",
                    F.concat_ws(" ", F.transform(
                        F.split("text", " "),
                        lambda t: F.when(F.array_contains(keep_arr, t), t)
                        .otherwise(F.concat(t, F.lit(f"·{i}"))))))
            if i > 0 and "embedding" in c.columns:
                # deterministic per-(copy, dim) sign flip: cosines
                # within the copy unchanged, cross-copy decorrelated
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda v, d: (v * (F.lit(1)
                                           - 2 * F.pmod(F.hash(F.lit(i), d),
                                                        F.lit(2))))
                        .cast("float")))
            out = c if out is None else out.unionByName(c)
        (out.repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(dst, f"{table}.parquet")))
        print(f"{table}: x{k} -> "
              f"{spark.read.parquet(os.path.join(dst, f'{table}.parquet')).count()} rows",
              flush=True)

    # argv[4]: optional comma list restricting which big tables to build
    # (e.g. "documents" for the r6 dedup sf10 probe — 100× documents is
    # ~1.3 GB; scaling embeddings/events too would triple the gen cost
    # for tables the probe never reads)
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    if only is None or "documents" in only:
        scaled("documents", "doc_id")
    if only is None or "embeddings" in only:
        scaled("embeddings", "vec_id")
    if only is None or "events" in only:
        scaled("events", "event_id", "user_id")
    if only is None:
        for t in _COPY_TABLES:
            spark.read.parquet(os.path.join(src, f"{t}.parquet")) \
                .write.mode("overwrite") \
                .parquet(os.path.join(dst, f"{t}.parquet"))
    print("done:", dst, flush=True)


if __name__ == "__main__":
    main()
