"""End-to-end curation composition (jobs/curate.py): the operator chain
runs as one pipeline, the funnel only shrinks, and the whole thing is
deterministic (every stage is hash/md5-based — no RNG anywhere)."""

from __future__ import annotations

from kglinker.jobs.curate import curate


def test_curation_funnel(spark):
    counts = curate(spark, "/root/testdata/sf0.001")
    order = ["input", "after_quality", "after_exact_dedup",
             "after_neardup", "after_decontamination", "after_sampling"]
    vals = [counts[k] for k in order]
    assert vals[0] == 500
    assert all(a >= b for a, b in zip(vals, vals[1:])), counts
    assert counts["after_sampling"] > 0
    # chunking emits ≥1 chunk per surviving doc; packing bins them
    assert counts["n_chunks"] >= counts["after_sampling"]
    assert 0 < counts["n_sequences"] <= counts["after_sampling"]

    # determinism: the full chain reproduces bit-for-bit
    assert curate(spark, "/root/testdata/sf0.001") == counts
