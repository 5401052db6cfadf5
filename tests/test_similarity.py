"""Similarity search: exact baselines + ANN recall vs brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fte.operators.similarity import (
    brute_force_topk,
    embedding_dup_pairs,
    ivf_build,
    ivf_topk,
    knn_join,
    lsh_topk,
)

DIM = 16
N = 300


@pytest.fixture(scope="module")
def emb_pdf():
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((5, DIM)) * 3
    rows = []
    for i in range(N):
        c = centers[i % 5]
        v = c + rng.standard_normal(DIM) * 0.3
        rows.append((i, (v / np.linalg.norm(v)).astype("float32").tolist()))
    # planted near-duplicate of vec 0
    v0 = np.array(rows[0][1]) + 1e-3
    rows.append((N, (v0 / np.linalg.norm(v0)).astype("float32").tolist()))
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def emb_df(spark, emb_pdf):
    return spark.createDataFrame(emb_pdf, "vec_id long, embedding array<float>").cache()


def _np_topk(emb_pdf, q, k):
    M = np.array(emb_pdf["embedding"].tolist(), dtype="float64")
    qv = np.asarray(q, dtype="float64")
    sims = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((emb_pdf["vec_id"].to_numpy(), -sims))
    return [int(emb_pdf["vec_id"].iloc[i]) for i in order[:k]]


def test_brute_force_matches_numpy(spark, emb_df, emb_pdf):
    q = emb_pdf["embedding"].iloc[0]
    got = brute_force_topk(emb_df, q, k=10).toPandas().sort_values("rank")
    assert got["vec_id"].tolist() == _np_topk(emb_pdf, q, 10)


def test_knn_join_per_query(spark, emb_df, emb_pdf):
    queries = spark.createDataFrame(
        emb_pdf.iloc[:3].rename(columns={"vec_id": "query_id"}),
        "query_id long, embedding array<float>",
    )
    got = knn_join(emb_df, queries, k=5).toPandas()
    assert set(got["query_id"]) == {0, 1, 2}
    for qid in range(3):
        sub = got[got.query_id == qid].sort_values("rank")
        assert sub["vec_id"].tolist() == _np_topk(emb_pdf, emb_pdf["embedding"].iloc[qid], 5)


def test_lsh_topk_recall(spark, emb_df, emb_pdf):
    q = emb_pdf["embedding"].iloc[0]
    exact = set(_np_topk(emb_pdf, q, 10))
    approx = set(lsh_topk(emb_df, q, k=10, n_bits=10, max_hamming=3).toPandas()["vec_id"])
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_embedding_dup_pairs_find_planted(spark, emb_df):
    pairs = embedding_dup_pairs(emb_df, threshold=0.999, n_bits=8).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, N) in found


def test_ivf_recall(spark, emb_df, emb_pdf):
    assigned, C = ivf_build(emb_df, n_cells=10)
    q = emb_pdf["embedding"].iloc[7]
    exact = set(_np_topk(emb_pdf, q, 10))
    approx = set(
        ivf_topk(assigned, C, q, k=10, nprobe=4).toPandas()["vec_id"]
    )
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_assignment_deterministic(spark, emb_df):
    a1, _ = ivf_build(emb_df, n_cells=10)
    a2, _ = ivf_build(emb_df.repartition(7), n_cells=10)
    p1 = a1.select("vec_id", "ivf_cell").toPandas().sort_values("vec_id")
    p2 = a2.select("vec_id", "ivf_cell").toPandas().sort_values("vec_id")
    assert p1["ivf_cell"].tolist() == p2["ivf_cell"].tolist()
