"""The independent mention-stage oracle (kglinker/oracle_matcher.py) must
agree with the engine row-for-row on the synthetic corpus — this replaces
the r1 circular check (oracle re-calling the engine core) with a genuine
two-implementation cross-check of matching + disambiguation + coref."""

from __future__ import annotations

import pandas as pd

from kglinker.data.transcripts import transcripts_pdf
from kglinker.extract.stage import annotate_pdf

N_CONVS = 120

_COLS = ["conv_id", "turn_idx", "start", "end", "mention_type",
         "surface", "kb_id", "resolved"]


def test_confidence_formulas_match_engine(kb_scored):
    from kglinker.data.kb_fixture import kb_rows_as_dicts
    from kglinker.oracle_matcher import oracle_confidence
    want = {r["kb_id"]: r["confidence"]
            for r in kb_scored.select("kb_id", "confidence").collect()}
    got = oracle_confidence(kb_rows_as_dicts())
    assert got == want


def test_oracle_matches_engine_rows(artifacts, oracle_linker):
    pdf = transcripts_pdf(N_CONVS).sort_values(["conv_id", "turn_idx"])
    want = annotate_pdf(pdf, artifacts)

    rows = []
    for conv, grp in pdf.groupby("conv_id", sort=True):
        turns = [(int(r.turn_idx), r.text) for r in grp.itertuples()]
        rows.extend(oracle_linker.annotate(str(conv), turns))
    got = pd.DataFrame(rows, columns=_COLS)

    assert len(got) == len(want) > 300
    key = ["conv_id", "turn_idx", "start"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    g["kb_id"] = g["kb_id"].astype("float64")
    w["kb_id"] = w["kb_id"].astype("float64")
    pd.testing.assert_frame_equal(g[_COLS], w[_COLS], check_dtype=False)


def test_oracle_shares_no_engine_matching_code():
    import ast

    import kglinker.oracle_matcher as om
    tree = ast.parse(open(om.__file__).read())
    banned = ("kglinker.automaton", "kglinker.extract.matcher",
              "kglinker.kb.scoring", "kglinker.extract.stage")
    for node in ast.walk(tree):
        mods = []
        if isinstance(node, ast.Import):
            mods = [a.name for a in node.names]
        elif isinstance(node, ast.ImportFrom):
            mods = [node.module or ""]
        for m in mods:
            assert not any(m.startswith(b) for b in banned), \
                f"oracle imports engine module {m}"
