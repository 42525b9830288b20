"""Source-format layer: JSONL/CSV transcripts and documents must conform
to the canonical schemas and produce IDENTICAL downstream results to the
parquet path (per-turn text equality is the BASELINE invariant — the
format must never leak into extraction)."""

from __future__ import annotations

import json
import os

import pytest

from kglinker.data.io import read_documents, read_transcripts

_TURNS = [
    {"conv_id": "c0", "turn_idx": 0, "role": "user",
     "text": "Petr Novák přijel do města Brno .", "tool": "",
     "ts": "2024-01-01T10:00:00"},
    {"conv_id": "c0", "turn_idx": 1, "role": "assistant",
     "text": "Marie Curie žije v Paříži .", "tool": "search",
     "ts": "2024-01-01T10:00:05"},
]

_DOCS = [
    {"doc_id": 1, "text": "a b c", "lang": "en", "source": "web",
     "n_chars": 5},
    {"doc_id": 2, "text": "d e f", "lang": "de", "source": "books",
     "n_chars": 5},
]


def test_jsonl_and_csv_transcripts_match_parquet(spark, tmp_path,
                                                 artifacts_bcast):
    from kglinker.extract.stage import extract_mentions
    jl = str(tmp_path / "t.jsonl")
    with open(jl, "w") as fh:
        for r in _TURNS:
            fh.write(json.dumps(r) + "\n")
    cs = str(tmp_path / "t.csv")
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    with open(cs, "w") as fh:
        fh.write(",".join(cols) + "\n")
        for r in _TURNS:
            fh.write(",".join(f'"{r[c]}"' for c in cols) + "\n")
    tj = read_transcripts(spark, jl, "jsonl")
    tc = read_transcripts(spark, cs, "csv")
    pq = str(tmp_path / "t.parquet")
    tj.write.parquet(pq)
    tp = read_transcripts(spark, pq, "parquet")
    # identical canonical schema across formats
    assert tj.schema == tc.schema == tp.schema
    rows_j = sorted(map(tuple, tj.collect()))
    assert rows_j == sorted(map(tuple, tc.collect()))
    assert rows_j == sorted(map(tuple, tp.collect()))
    # per-turn text equality: stored text is byte-identical to the source
    texts = {(r["conv_id"], r["turn_idx"]): r["text"] for r in tj.collect()}
    assert texts[("c0", 0)] == _TURNS[0]["text"]
    # extraction results are format-independent
    mj = sorted(map(tuple, extract_mentions(tj, artifacts_bcast).collect()))
    mp = sorted(map(tuple, extract_mentions(tp, artifacts_bcast).collect()))
    assert mj == mp and len(mj) > 0


def test_documents_sources_and_missing_columns(spark, tmp_path):
    jl = str(tmp_path / "d.jsonl")
    with open(jl, "w") as fh:
        for r in _DOCS:
            fh.write(json.dumps(r) + "\n")
    dj = read_documents(spark, jl, "jsonl")
    assert [f.name for f in dj.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars"]
    assert dict(dj.dtypes)["doc_id"] == "bigint"
    assert dict(dj.dtypes)["n_chars"] == "int"
    assert dj.count() == 2
    # missing required columns fail loud with the full list
    bad = str(tmp_path / "bad.jsonl")
    with open(bad, "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": "x"}) + "\n")
    with pytest.raises(ValueError, match="missing required columns"):
        read_documents(spark, bad, "jsonl")
    with pytest.raises(ValueError, match="unsupported source format"):
        read_documents(spark, jl, "avro")


def test_real_testdata_through_the_layer(spark):
    docs = read_documents(spark, "/root/testdata/sf0.001/documents.parquet")
    assert docs.count() == 500
    assert dict(docs.dtypes)["n_chars"] == "int"   # int64 → int conformed
