"""Generate the committed expected-output parquet for the two pipeline
driver gates (``kg_pipeline_mentions`` / ``kg_pipeline_triples``).

The artifacts are produced by the INDEPENDENT oracle
(:mod:`kglinker.oracle_matcher` + :mod:`kglinker.oracle`), not the engine,
so the driver's hash comparison against them is a genuine two-
implementation cross-check. Spark is used only to run the KB-side
namelist/subname builds whose collected rows are the oracle's *input
data* (those builds carry their own driver gates).

Regenerate after any semantic change:
    PYTHONPATH=/root/repo python -m kglinker.jobs.gen_expected
`tests/test_pipeline_expected.py` fails if the committed files are stale.
"""

from __future__ import annotations

import os

import pandas as pd

EXPECTED_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                            "tests", "expected")


def _n_convs() -> int:
    from kglinker.queries import _PIPE_CONVS
    return _PIPE_CONVS


def build_expected() -> tuple[pd.DataFrame, pd.DataFrame]:
    """(mentions_pdf, triples_pdf) from the independent oracle."""
    from kglinker.data.kb_fixture import kb_df, kb_rows_as_dicts
    from kglinker.data.transcripts import transcripts_pdf
    from kglinker.kb.names import build_namelist, build_subname_map
    from kglinker.kb.scoring import score_kb
    from kglinker.oracle import oracle_mentions, oracle_triples
    from kglinker.oracle_matcher import OracleLinker
    from kglinker.runtime.session import get_spark

    spark = get_spark("gen-expected", cores=4, shuffle_partitions=8)
    kb_scored = score_kb(kb_df(spark))
    nl = [r.asDict() for r in build_namelist(kb_scored).collect()]
    sub = [r.asDict() for r in build_subname_map(kb_scored).collect()]
    linker = OracleLinker(kb_rows_as_dicts(), nl, sub)

    tpdf = transcripts_pdf(_n_convs())
    mentions = oracle_mentions(tpdf, linker)
    mentions = mentions.astype({"turn_idx": "int32", "start": "int32",
                                "end": "int32", "kb_id": "Int64"})

    triples = sorted(oracle_triples(tpdf, linker),
                     key=lambda t: tuple("" if x is None else str(x) for x in t))
    triples_pdf = pd.DataFrame(triples,
                               columns=["subj", "pred", "obj", "conv_id"])
    return mentions, triples_pdf


def build_expected_kb() -> dict[str, pd.DataFrame]:
    """KB-side expected artifacts (engine-backed ⊕ gates): the raw KB
    fixture as a parquet INPUT both sides read, plus namelist / alias-edge
    / canonical-map expectations from the plain-python oracles."""
    from kglinker.data.kb_fixture import KB_COLUMNS, KB_ROWS, kb_rows_as_dicts
    from kglinker.oracle import oracle_canonical_map
    from kglinker.oracle_kb import oracle_alias_edges, oracle_namelist

    from kglinker.oracle_kb import oracle_merged_entities

    kb = pd.DataFrame(KB_ROWS, columns=KB_COLUMNS)
    rows = kb_rows_as_dicts()
    nl = pd.DataFrame([
        {"surface": r["surface"],
         "id_list": ",".join(str(i) for i in r["kb_ids"]),
         "is_fragment": r["is_fragment"]}
        for r in oracle_namelist(rows)])
    edges = pd.DataFrame(oracle_alias_edges(rows))[["src", "dst"]]
    cmap = oracle_canonical_map(rows)
    canon = pd.DataFrame(sorted(cmap.items()), columns=["kb_id", "canon_id"])
    merged = pd.DataFrame(oracle_merged_entities(rows, cmap))
    return {"kb_fixture": kb, "kb_namelist": nl,
            "kb_alias_edges": edges, "kb_canonical": canon,
            "kb_merged_entities": merged}


def main() -> None:
    out = os.path.abspath(EXPECTED_DIR)
    os.makedirs(out, exist_ok=True)
    mentions, triples = build_expected()
    mentions.to_parquet(os.path.join(out, "kg_pipeline_mentions.parquet"),
                        index=False)
    triples.to_parquet(os.path.join(out, "kg_pipeline_triples.parquet"),
                       index=False)
    for name, df in build_expected_kb().items():
        df.to_parquet(os.path.join(out, f"{name}.parquet"), index=False)
    print(f"wrote {len(mentions)} mention rows, {len(triples)} triple rows "
          f"+ kb artifacts to {out}")


if __name__ == "__main__":
    main()
