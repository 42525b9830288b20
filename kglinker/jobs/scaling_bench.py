"""Two-cluster-size scaling evidence (BASELINE.md protocol).

Runs the extraction pipeline — the engine's dominant cost at 10^12 turns —
over a compute-bound synthetic corpus at one parallelism level per
invocation (one JVM per level), printing a JSON line. Drive it twice:

    SPARK_GRAFT_CPUS=8  python -m kglinker.jobs.scaling_bench
    SPARK_GRAFT_CPUS=32 python -m kglinker.jobs.scaling_bench

and compute ``scaling_efficiency = (tp_32 / tp_8) / 4`` (BASELINE.json:
≥ 0.8). ``SCALE_CONVS`` (default 1.2M conversations ≈ 8.4M turns) sizes
the corpus so the N-level run takes minutes, not seconds — fixed overheads
(session start, broadcast, Python worker spin-up) are excluded from the
measured phase and amortized within it.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_convs = int(os.environ.get("SCALE_CONVS", "1200000"))
    # SCALE_CLUSTERED=1 → measure the conversation-clustered fast path
    # (no conv_id exchange; the layout an Iceberg bucket(conv_id) table
    # guarantees) instead of the default shuffle path
    clustered = os.environ.get("SCALE_CLUSTERED", "") == "1"
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    from kglinker.data.transcripts import transcripts_df
    from kglinker.extract.stage import extract_mentions
    from kglinker.jobs.pipeline import build_kb_side
    from kglinker.runtime.session import get_spark

    spark = get_spark("kglinker-scaling", cores=cpus,
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    _, art, _ = build_kb_side(spark)

    # materialize the corpus to parquet first so the measured phase reads a
    # real table (scan → shuffle → python), not a generator pipeline
    from kglinker.data.transcripts import GEN_VERSION
    corpus = f"/tmp/kgl_scale_corpus_{n_convs}_v{GEN_VERSION}"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        transcripts_df(spark, n_convs, partitions=64).write.mode(
            "overwrite").parquet(corpus)
    transcripts = spark.read.parquet(corpus)

    # warm-up: spin up python workers + ship broadcast (excluded, tiny slice)
    extract_mentions(transcripts.limit(2000), art, num_partitions=cpus).count()

    t0 = time.time()
    mentions = extract_mentions(transcripts, art, num_partitions=2 * cpus,
                                assume_clustered=clustered)
    n_mentions = mentions.count()
    wall = time.time() - t0
    n_turns = transcripts.count()

    print(json.dumps({
        "level": f"local[{cpus}]" + ("/clustered" if clustered else ""),
        "cpus": cpus,
        "n_convs": n_convs,
        "n_turns": n_turns,
        "n_mentions": n_mentions,
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
    }))


if __name__ == "__main__":
    main()
