"""Scale-honest evidence for the registered embedding-LSH parameters
(r2 verdict demand #2): at the REGISTERED 16-plane / 4-band multi-probe
configuration (kglinker/queries.py LSH_PLANES/LSH_BANDS), near-dup recall
vs exact brute force must be ≥0.9 at the near-dup threshold (0.95).

The committed embeddings fixture is near-orthogonal random vectors (max
pairwise cosine ≈0.48 — no true near-dups), so this gate synthesizes a
deterministic corpus WITH planted near-duplicates: base vectors (md5-
derived, no RNG) each cloned with a small perturbation so that clone
pairs sit at cosine ≥0.95 while cross-base pairs stay far below.

Also pins the banded candidate-volume property: candidates are a strict
subset of all pairs (the operator never degenerates to all-pairs).
"""

from __future__ import annotations

import hashlib
import math

from kglinker.ops.similarity import lsh_band_keys, lsh_neardup_pairs
from kglinker.queries import LSH_BANDS, LSH_PLANES

DIM = 64
N_BASE = 50
CLONES = 2  # near-dup copies per base vector (plus the base itself)


def _h(tag: str) -> float:
    d = hashlib.md5(tag.encode()).hexdigest()
    return int(d[:8], 16) / float(0xFFFFFFFF) - 0.5


def _corpus() -> list[tuple[int, list[float]]]:
    rows = []
    vid = 0
    for b in range(N_BASE):
        base = [_h(f"base:{b}:{d}") for d in range(DIM)]
        nb = math.sqrt(sum(x * x for x in base))
        base = [x / nb for x in base]
        rows.append((vid, base))
        vid += 1
        for c in range(CLONES):
            pert = [base[d] + _h(f"pert:{b}:{c}:{d}") * 0.055
                    for d in range(DIM)]
            rows.append((vid, pert))
            vid += 1
    return rows


def _cos(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_banded_lsh_neardup_recall_at_registered_params(spark):
    rows = _corpus()
    truth = {(a_id, b_id)
             for i, (a_id, av) in enumerate(rows)
             for (b_id, bv) in rows[i + 1:]
             if _cos(av, bv) >= 0.95}
    assert len(truth) >= N_BASE * CLONES, "fixture must plant near-dups"

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")
    got = {(r["vec_a"], r["vec_b"]) for r in
           lsh_neardup_pairs(emb, LSH_PLANES, threshold=0.95,
                             bands=LSH_BANDS).collect()}
    # no false positives possible (exact cosine verified on candidates)
    assert got <= truth
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} at 16 planes / 4 bands"


def test_banded_candidates_never_all_pairs(spark):
    """The band join must prune: on near-orthogonal data (the committed
    embeddings fixture) candidate pairs ≪ n(n-1)/2."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    bk = lsh_band_keys(emb, LSH_PLANES, LSH_BANDS).select(
        "vec_id", "band", "key")
    a, b = bk.alias("a"), bk.alias("b")
    from pyspark.sql import functions as F
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select("a.vec_id", "b.vec_id").distinct().count())
    all_pairs = n * (n - 1) // 2
    assert cand < 0.5 * all_pairs, (cand, all_pairs)


def test_band_keys_shape(spark):
    emb = spark.createDataFrame(
        [(0, [1.0] * DIM), (1, [-1.0] * DIM)],
        "vec_id long, embedding array<double>")
    bk = lsh_band_keys(emb, LSH_PLANES, LSH_BANDS).collect()
    assert len(bk) == 2 * LSH_BANDS
    rpb = len(LSH_PLANES) // LSH_BANDS
    assert all(len(r["key"]) == rpb for r in bk)
    # opposite vectors have complementary sign bits in every band
    by_vec = {}
    for r in bk:
        by_vec.setdefault(r["vec_id"], {})[r["band"]] = r["key"]
    flip = str.maketrans("01", "10")
    for band in range(LSH_BANDS):
        assert by_vec[0][band] == by_vec[1][band].translate(flip)


def test_lsh_topk_recall_on_clustered_corpus(spark):
    """ANN top-k recall at the REGISTERED plane/band params on a
    clustered corpus (the md5-derived cluster fixture of the IVF gate):
    banded multi-probe lsh_topk must recover ≥0.8 of the brute-force
    top-10 — the same evidence style the near-dup path already carries."""
    import hashlib

    from kglinker.ops.similarity import cosine_topk, lsh_topk

    def h(tag: str) -> float:
        d = hashlib.md5(tag.encode()).hexdigest()
        return int(d[:8], 16) / float(0xFFFFFFFF) - 0.5

    rows, vid = [], 0
    for i in range(40):
        for c in range(6):
            center = [h(f"c{c}:{d}") * 4 for d in range(DIM)]
            rows.append((vid, [center[d] + h(f"v{c}:{i}:{d}") * 0.3
                               for d in range(DIM)]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    queries = [10, 77, 151]
    truth = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(emb, queries, 10).collect()}
    got = {(r["query_id"], r["vec_id"])
           for r in lsh_topk(emb, queries, LSH_PLANES, k=10,
                             bands=LSH_BANDS).collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, recall
