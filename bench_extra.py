"""Extra benchmarks for the optimization rounds (bench.py is frozen for
measurement — this file holds the guide-§1.4 isolation runs).

Usage:
  python bench_extra.py [--queries q1,q2,...] [--plans-dir plans/r07 --suffix before]
      [--repeats N] [--sink noop|count]

Times each selected registry query in its own cold-ish region with a
labelled job (guide §1.5), using the noop sink by default (§1.4:
computes every column, no optimizer pruning) and optionally dumps
``explain("formatted")`` to ``<plans-dir>/<query>_<suffix>.txt``.
Environment contract matches bench.py ($SPARK_GRAFT_SF_DIR/_CPUS).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None,
                    help="comma list; default = bench.py's headline set")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--sink", choices=["noop", "count"], default="noop")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from kglinker.queries import QUERIES
    from kglinker.runtime.session import get_spark

    spark = get_spark("kglinker-bench-extra", cores=cpus,
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .selectExpr("count(distinct doc_id)", "sum(length(text))").collect()

    if args.queries:
        names = args.queries.split(",")
    else:
        names = [n for n, q in QUERIES.items()
                 if q.headline and not n.startswith("kg_pipeline")]

    timings: dict[str, list[float]] = {}
    for name in names:
        q = QUERIES[name]
        timings[name] = []
        for rep in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            timings[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                q.fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(args.plans_dir,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "sink": args.sink,
                      "timings": timings}))


if __name__ == "__main__":
    main()
