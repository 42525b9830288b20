"""Dedup scale probe (r5 verdict #7): one more order of magnitude on the
three data-bound dedup queries.

Runs ``dedup_exact`` / ``dedup_minhash_lsh`` / ``dedup_simhash_pairs`` at
the PRODUCTION gate parameters on 1× (sf0.1, ~5k docs), 10× (~50k) and
100× (~500k ≈ sf10) deterministic corpora (:mod:`gen_scaled` shifted
copies — Jaccard-preserving token renames, so no duplicate pathology),
and reports wall plus per-stage CANDIDATE-VOLUME telemetry — the 100 TB
risk surface is candidate growth, not scan growth: if band/block
collision counts grow ~linearly with the corpus, the plans hold at the
next two orders of magnitude; quadratic-ish growth would mean the
banding parameters saturate.

Walls are measured WITHOUT telemetry (separate pass: each candidate
count is an extra job). One JSON line per (scale, query).

    PYTHONPATH=/root/repo python -m kglinker.jobs.dedup_scale_probe \
        [max_scale=100]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_SRC = "/root/testdata/sf0.1"
# production gate parameters (kglinker/queries.py registry)
_MINHASH = dict(num_hashes=64, bands=16, min_est=0.5)
_SIMHASH = dict(bits=64, k=3)


def _corpus_dir(scale: int) -> str:
    if scale == 1:
        return _SRC
    dst = f"/tmp/kgl_scaleprobe_{scale}x"
    marker = os.path.join(dst, "documents.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        subprocess.run(
            [sys.executable, "-m", "kglinker.jobs.gen_scaled", _SRC, dst,
             str(scale), "documents"],
            check=True, env={**os.environ, "PYTHONPATH": "/root/repo"})
    return dst


def main() -> None:
    from pyspark.sql import functions as F

    from kglinker.ops.dedup import (exact_dedup_groups, minhash_lsh_pairs,
                                    simhash_pairs)
    from kglinker.runtime.partitioning import fan_out
    from kglinker.runtime.session import get_spark

    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    scales = [s for s in (1, 10, 100) if s <= max_scale]
    dirs = {s: _corpus_dir(s) for s in scales}

    spark = get_spark("kgl-dedup-scale", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    for scale in scales:
        docs = fan_out(spark.read.parquet(
            os.path.join(dirs[scale], "documents.parquet")))
        n_docs = docs.count()

        t0 = time.time()
        n_groups = exact_dedup_groups(docs).count()
        row = {"query": "dedup_exact", "scale": scale, "n_docs": n_docs,
               "wall_s": round(time.time() - t0, 2), "n_out": n_groups}
        print(json.dumps(row), flush=True)

        t0 = time.time()
        n_pairs = minhash_lsh_pairs(docs, **_MINHASH).count()
        wall = time.time() - t0
        st: dict = {}
        minhash_lsh_pairs(docs, **_MINHASH, stats=st).count()
        row = {"query": "dedup_minhash_lsh", "scale": scale,
               "n_docs": n_docs, "wall_s": round(wall, 2),
               "n_candidates": st["n_candidates"], "n_out": n_pairs}
        print(json.dumps(row), flush=True)

        t0 = time.time()
        n_pairs = simhash_pairs(docs, **_SIMHASH).count()
        wall = time.time() - t0
        st = {}
        simhash_pairs(docs, **_SIMHASH, stats=st).count()
        row = {"query": "dedup_simhash_pairs", "scale": scale,
               "n_docs": n_docs, "wall_s": round(wall, 2),
               "n_collisions": st["n_collisions"], "n_out": n_pairs}
        print(json.dumps(row), flush=True)

        # r6 combination scheme (B=6): same pair set, wider keys — the
        # saturation fix measured head-to-head on the same corpus
        t0 = time.time()
        n_pairs6 = simhash_pairs(docs, **_SIMHASH, n_blocks=6).count()
        wall = time.time() - t0
        st = {}
        simhash_pairs(docs, **_SIMHASH, n_blocks=6, stats=st).count()
        row = {"query": "dedup_simhash_pairs_b6", "scale": scale,
               "n_docs": n_docs, "wall_s": round(wall, 2),
               "n_collisions": st["n_collisions"], "n_out": n_pairs6}
        assert n_pairs6 == n_pairs, "combination scheme lost pairs"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
