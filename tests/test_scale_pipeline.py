"""sf0.1-scale pipeline gate (r2 verdict demand #8): the driver's hash
gates sweep sf0.001-scale inputs (150 convs); this marked-slow test runs
the full kg_pipeline (extract → triples) at the driver-bench sf0.1 scale
(3,000 conversations ≈ 21k turns) against the INDEPENDENT oracle, live —
catching scale-dependent bugs (Arrow batch-boundary carries, hot-key
skew paths, multi-partition carry-over) that the small gates cannot see.
"""

from __future__ import annotations

import pandas as pd
import pytest

N_CONVS = 3000  # = the driver bench's sf0.1 conversation count

_COLS = ["conv_id", "turn_idx", "start", "end", "mention_type",
         "surface", "kb_id", "resolved"]


@pytest.mark.slow
def test_pipeline_parity_at_sf01_scale(spark, kb_scored, artifacts,
                                       artifacts_bcast, oracle_linker):
    from kglinker.data.transcripts import transcripts_df, transcripts_pdf
    from kglinker.extract.stage import extract_mentions
    from kglinker.graph.triples import build_triples
    from kglinker.oracle import oracle_mentions, oracle_triples

    tdf = transcripts_df(spark, N_CONVS)
    got_m = extract_mentions(tdf, artifacts_bcast, num_partitions=8).cache()
    got_mentions = got_m.toPandas()

    tpdf = transcripts_pdf(N_CONVS)
    want_mentions = oracle_mentions(tpdf, oracle_linker)

    assert len(got_mentions) == len(want_mentions) > 30_000
    key = ["conv_id", "turn_idx", "start"]
    g = got_mentions.sort_values(key).reset_index(drop=True)
    w = want_mentions.sort_values(key).reset_index(drop=True)
    g["kb_id"] = g["kb_id"].astype("float64")
    w["kb_id"] = w["kb_id"].astype("float64")
    pd.testing.assert_frame_equal(g[_COLS], w[_COLS], check_dtype=False)

    # triples stage on top of the same mentions (salted weights, pair
    # generation, canonicalization)
    from kglinker.graph.canonicalize import canonical_map
    canon = canonical_map(kb_scored)
    got_t = build_triples(got_m, kb_scored, canon).drop("weight").toPandas()
    want_t = pd.DataFrame(
        sorted(oracle_triples(tpdf, oracle_linker),
               key=lambda t: tuple("" if x is None else str(x) for x in t)),
        columns=["subj", "pred", "obj", "conv_id"])
    assert len(got_t) == len(want_t) > 50_000
    tkey = ["subj", "pred", "obj", "conv_id"]
    gt = got_t.astype(str).sort_values(tkey).reset_index(drop=True)
    wt = want_t.astype(str).sort_values(tkey).reset_index(drop=True)
    pd.testing.assert_frame_equal(gt[tkey], wt[tkey])
