"""Pre-driver sweep: replay the driver's correctness comparison over the
WHOLE registry at an arbitrary scale dir (default sf0.01 — the scale the
driver actually runs, one order of magnitude above the suite's sf0.001
gate tests). Emits one JSON line per gate with rows/schema/value-match
booleans — the same shape as ``CORRECTNESS_r{N}.json`` — so a regression
that only appears at the driver's scale is caught before the driver runs.

    PYTHONPATH=/root/repo python -m kglinker.jobs.validate_gates \
        [/root/testdata/sf0.01] [gate ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(df) -> list[tuple]:
    """Type-tagged value rendering, identical to the suite's (int 146 ≠
    float 146.0 — the driver's hash is at least that strict)."""
    import numpy as np
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("\x00null")
            elif isinstance(v, (bool, np.bool_)):
                row.append(f"b:{bool(v)}")
            elif isinstance(v, (float, np.floating)):
                row.append(f"f:{float(v)!r}")
            elif isinstance(v, (int, np.integer)):
                row.append(f"i:{int(v)}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


def main() -> None:
    import duckdb

    from kglinker.queries import QUERIES
    from kglinker.runtime.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)

    spark = get_spark("kgl-validate-gates", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(sf_dir, t)}.parquet')")

    failures = 0
    for name in names:
        q = QUERIES[name]
        try:
            got = q.fn(spark, sf_dir).toPandas()
            want = con.execute(q.sql).fetchdf()
            row = {
                "gate": name,
                "rows_match": len(got) == len(want),
                "schema_match": sorted(got.columns) == sorted(want.columns),
                "hash_match": _normalize(got) == _normalize(want),
                "spark_rows": len(got), "oracle_rows": len(want),
                "err": None,
            }
        except Exception as e:   # keep sweeping; report per-gate
            row = {"gate": name, "rows_match": False, "schema_match": False,
                   "hash_match": False, "err": f"{type(e).__name__}: {e}"}
        if not (row.get("rows_match") and row.get("schema_match")
                and row.get("hash_match")):
            failures += 1
        print(json.dumps(row), flush=True)
    print(json.dumps({"gates": len(names), "failures": failures}),
          flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
