"""Staleness guard for the committed expected-output parquet used by the
driver's kg_pipeline_* oracles: regenerating from the independent oracle
must reproduce the committed files exactly. If this fails after a semantic
change, re-run `python -m kglinker.jobs.gen_expected` and commit."""

from __future__ import annotations

import os

import pandas as pd

from kglinker.jobs.gen_expected import EXPECTED_DIR, build_expected


def test_committed_expected_parquet_up_to_date(spark):
    out = os.path.abspath(EXPECTED_DIR)
    mentions, triples = build_expected()
    got_m = pd.read_parquet(os.path.join(out, "kg_pipeline_mentions.parquet"))
    got_t = pd.read_parquet(os.path.join(out, "kg_pipeline_triples.parquet"))
    pd.testing.assert_frame_equal(
        mentions.reset_index(drop=True), got_m, check_dtype=False)
    pd.testing.assert_frame_equal(
        triples.reset_index(drop=True), got_t, check_dtype=False)
    assert len(got_m) > 1000 and len(got_t) > 1000


def test_committed_kb_artifacts_up_to_date():
    from kglinker.jobs.gen_expected import build_expected_kb
    out = os.path.abspath(EXPECTED_DIR)
    for name, df in build_expected_kb().items():
        got = pd.read_parquet(os.path.join(out, f"{name}.parquet"))
        pd.testing.assert_frame_equal(
            df.reset_index(drop=True), got, check_dtype=False)
