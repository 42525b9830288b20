"""Streaming throughput bench: docs/sec through the three foreachBatch
streams (exact-dedup admission, minhash near-dup admission, incremental
co-occurrence edge merge) on a multi-file input directory — the
micro-batch shape `availableNow` processes the same way a live trigger
would, so the wall measures the real per-batch work: state read,
candidate joins, state append, replay-marker write.

Input: K parquet files of the sf-dir documents table (one micro-batch
source split each) resp. synthesized transcripts for the edge stream.
One JSON line per stream.

    PYTHONPATH=/root/repo python -m kglinker.jobs.streaming_bench \
        [/root/testdata/sf0.1] [n_files=8]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    from pyspark.sql import functions as F

    from kglinker.runtime.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spark = get_spark("kgl-streaming-bench", cores=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="kgl_stream_bench_")

    from kglinker.streaming.dedup import DOCS_SCHEMA
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # conform to the stream's declared read schema (the testdata table
    # stores n_chars as int64; the stream declares int)
    docs = docs.select(*[F.col(f.split(" ")[0]).cast(f.split(" ")[1])
                         for f in DOCS_SCHEMA.split(", ")])
    n_docs = docs.count()
    docs_dir = os.path.join(work, "docs_in")
    docs.repartition(n_files).write.mode("overwrite").parquet(docs_dir)

    from kglinker.streaming.dedup import (read_dedup_state,
                                          read_neardup_state,
                                          stream_dedup_documents,
                                          stream_neardup_documents)

    for name, starter, reader in (
            ("stream_exact_dedup", stream_dedup_documents, read_dedup_state),
            ("stream_neardup", stream_neardup_documents, read_neardup_state)):
        st = os.path.join(work, name + "_state")
        cp = os.path.join(work, name + "_cp")
        t0 = time.time()
        q = starter(spark, docs_dir, st, cp, max_files_per_trigger=1)
        q.awaitTermination()
        wall = time.time() - t0
        admitted = reader(spark, st).count()
        print(json.dumps({
            "stream": name, "n_docs": n_docs, "n_files": n_files,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(n_docs / wall, 1),
            "admitted": admitted}), flush=True)

    # edge stream over synthesized transcripts (extraction + merge)
    from kglinker.data.transcripts import transcripts_df
    from kglinker.jobs.pipeline import build_kb_side
    from kglinker.streaming.graph import (read_edge_state,
                                          stream_cooccurrence_edges)
    _, art, _ = build_kb_side(spark)
    n_convs = max(2000, n_docs // 2)
    tdf = transcripts_df(spark, n_convs)
    n_turns = tdf.count()
    tdir = os.path.join(work, "turns_in")
    tdf.repartition(n_files).write.mode("overwrite").parquet(tdir)
    st = os.path.join(work, "edges_state")
    cp = os.path.join(work, "edges_cp")
    t0 = time.time()
    q = stream_cooccurrence_edges(spark, tdir, st, cp, art,
                                  max_files_per_trigger=1)
    q.awaitTermination()
    wall = time.time() - t0
    n_edges = read_edge_state(spark, st).count()
    print(json.dumps({
        "stream": "stream_cooccurrence_edges", "n_turns": n_turns,
        "n_files": n_files, "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
        "n_edges": n_edges}), flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
