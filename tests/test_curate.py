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


def test_curation_repeated_span_stage_optin(spark, tmp_path):
    """r6: the opt-in repeated-substring stage drops boilerplate-heavy
    survivors that near-dup dedup does NOT remove (distinct docs sharing
    a long footer), and leaves the default chain byte-stable."""
    from kglinker.jobs.curate import curate
    footer = " ".join(f"legal{i}" for i in range(24))
    rows = []
    for d in range(40):
        body = " ".join(f"tok{d}_{j}" for j in range(30))
        # half the docs carry the shared 24-token footer: dup_frac ≈
        # 24/54 ≈ 0.44 — above a 0.3 threshold, far below near-dup range
        text = f"{body} {footer}" if d % 2 == 0 else body
        rows.append((d, text, "en", "web", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")
    sf = str(tmp_path)
    docs.write.parquet(sf + "/documents.parquet")
    base = curate(spark, sf)
    assert "after_repeated_spans" not in base
    got = curate(spark, sf, max_dup_frac=0.3, dup_k=8)
    # the 20 footer docs are dropped; the 20 clean docs survive
    assert got["after_repeated_spans"] < got["after_neardup"]
    assert got["after_repeated_spans"] > 0
    assert got["after_neardup"] - got["after_repeated_spans"] == 20
    assert got["after_sampling"] <= got["after_repeated_spans"]
    for k in ("input", "after_quality", "after_exact_dedup",
              "after_neardup"):
        assert got[k] == base[k]
