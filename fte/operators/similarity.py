"""Similarity search over embedding columns (array<float>).

Three tiers:
- brute_force_topk: exact cosine top-k for a single query vector —
  one scan, JVM higher-order dot product, top-k via takeOrdered-style
  window. The correctness baseline.
- knn_join: exact top-k for a (small, broadcastable) query SET —
  broadcast nested-loop + per-query window rank. Fine up to ~10^3
  queries × 10^8 corpus on a big cluster.
- lsh_topk / with_rh_signature: random-hyperplane LSH — signature
  bucketing bounds the candidate set so the scale path touches only
  matching buckets. Recall is tunable by (n_bits, n_tables).
- ivf_topk: inverted-file index — centroids sampled deterministically,
  rows assigned to nearest centroid (one broadcast pass), queries probe
  the nprobe nearest centroid cells only. The classic ANN layout for
  100 TB corpora: cell assignment is written once, queries prune by cell.

All dot products run as F.aggregate/zip_with over double arrays —
JVM-side, no Python workers.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


def _lit_vec(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v]).cast("array<double>")


def brute_force_topk(
    df: DataFrame, query_vec, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k vs one query vector."""
    emb = _as_double(vec_col)
    q = _lit_vec(query_vec)
    sim = cosine(emb, q)
    w = Window.orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        df.select(id_col, sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k per query row: broadcast the query set, rank per
    query. Output: (query_id, vec_id, cos_sim, rank)."""
    q = queries.select(
        F.col(query_id), _as_double(query_vec).alias("_qv")
    )
    c = corpus.select(F.col(corpus_id), _as_double(corpus_vec).alias("_cv"))
    joined = c.crossJoin(F.broadcast(q))
    sim = cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim")
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(corpus_id))
    return (
        joined.select(query_id, corpus_id, sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------- random-hyperplane LSH

def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng([seed, 0x51617])
    return rng.standard_normal((n_bits, dim))


def with_rh_signature(
    df: DataFrame, vec_col: str = "embedding", n_bits: int = 16, seed: int = 42,
    dim: int | None = None, out_col: str = "rh_sig",
) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v · h_i). Cosine-close
    vectors agree on most bits. Hyperplanes are literals compiled into
    the plan (n_bits × dim doubles — trivially broadcastable)."""
    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    H = _hyperplanes(dim, n_bits, seed)
    emb = _as_double(vec_col)
    sig = F.lit(0).cast("long")
    for i in range(n_bits):
        sig = sig + F.when(dot(emb, _lit_vec(H[i])) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(out_col, sig)


def lsh_topk(
    df: DataFrame, query_vec, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
    n_bits: int = 12, max_hamming: int = 2, seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: scan only rows whose signature is
    within ``max_hamming`` bits of the query's — at 10^9+ rows combine
    with a signature-partitioned layout so the filter prunes files."""
    qv = [float(x) for x in query_vec]
    H = _hyperplanes(len(qv), n_bits, seed)
    q_sig = 0
    for i in range(n_bits):
        if float(np.dot(H[i], qv)) > 0:
            q_sig |= 1 << i
    sigged = with_rh_signature(df, vec_col, n_bits, seed, dim=len(qv))
    cand = sigged.filter(
        F.bit_count(F.col("rh_sig").bitwiseXOR(F.lit(q_sig))) <= max_hamming
    )
    emb = _as_double(vec_col)
    sim = cosine(emb, _lit_vec(qv))
    w = Window.orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        cand.select(id_col, sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_dup_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, n_bits: int = 12, seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via signature-bucket
    self-join (exact cosine verified inside buckets). Pairs whose
    signatures differ are missed — recall is the standard LSH tradeoff;
    raise recall with multiple tables (seeds) unioned."""
    sigged = with_rh_signature(df, vec_col, n_bits, seed).select(
        id_col, F.col(vec_col), "rh_sig"
    )
    a = sigged.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("rh_sig")
    )
    b = sigged.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("rh_sig")
    )
    return (
        a.join(b, "rh_sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(_as_double(F.col("_va")), _as_double(F.col("_vb"))))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ------------------------------------------------------ blockwise GEMM

def all_pairs_topk_gemm(
    df: DataFrame, k: int = 20, id_col: str = "vec_id", vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact global top-k most-similar pairs via blockwise numpy GEMM.

    The scale path for all-pairs similarity: rows are hashed into
    ``n_blocks`` blocks; each of the n(n+1)/2 block pairs is one task
    that runs a dense (block × block) cosine GEMM in numpy (Arrow in,
    vectorized BLAS, no per-pair interpretation) and emits only its
    local top-k; a final window keeps the global top-k. Every global
    top-k pair lives in exactly one block pair, so this is exact.

    Memory per task = 2 blocks of vectors + a block² score tile —
    size n_blocks so block² tiles fit the executor (at 10^9 rows use
    LSH/IVF instead; GEMM all-pairs is for 10^5-10^7 corpora).
    """
    import pandas as pd

    b = df.select(
        F.col(id_col).cast("long").alias("_id"),
        _as_double(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    grouped = b.groupBy("_blk").agg(
        F.collect_list(F.struct("_id", "_v")).alias("_rows")
    )
    x = grouped.select(F.col("_blk").alias("_bx"), F.col("_rows").alias("_rx"))
    y = grouped.select(F.col("_blk").alias("_by"), F.col("_rows").alias("_ry"))
    combos = x.crossJoin(y).filter(F.col("_bx") <= F.col("_by"))

    out_schema = "id_a long, id_b long, cos_sim double"

    def gemm(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ra, rb = row["_rx"], row["_ry"]
                ida = np.array([r["_id"] for r in ra], dtype="int64")
                idb = np.array([r["_id"] for r in rb], dtype="int64")
                A = np.array([r["_v"] for r in ra], dtype="float64")
                B = np.array([r["_v"] for r in rb], dtype="float64")
                A /= np.linalg.norm(A, axis=1, keepdims=True)
                B /= np.linalg.norm(B, axis=1, keepdims=True)
                S = A @ B.T
                ia, ib = np.meshgrid(np.arange(len(ida)), np.arange(len(idb)), indexing="ij")
                pa, pb = ida[ia.ravel()], idb[ib.ravel()]
                s = S.ravel()
                keep = pa < pb  # dedup within-block and order pairs
                pa, pb, s = pa[keep], pb[keep], s[keep]
                if len(s) > k:
                    top = np.argpartition(-s, k)[:k]
                    pa, pb, s = pa[top], pb[top], s[top]
                yield pd.DataFrame({"id_a": pa, "id_b": pb, "cos_sim": s})

    local = combos.mapInPandas(gemm, out_schema)
    w = Window.orderBy(F.desc("cos_sim"), F.asc("id_a"), F.asc("id_b"))
    return (
        local.withColumn("pair_rank", F.row_number().over(w))
        .filter(F.col("pair_rank") <= k)
    )


# ---------------------------------------------------------------- IVF

def ivf_build(
    df: DataFrame, n_cells: int = 64, id_col: str = "vec_id", vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """Assign every row to its nearest (max-dot) centroid.

    Centroids are a deterministic sample of the data (k-means init
    without the iterations — adequate for bucketing; swap in proper
    k-means offline if cell balance matters). Returns (assigned_df
    with `ivf_cell`, centroids array). At scale, write the assigned
    table partitioned by ivf_cell so queries prune cells at the scan.
    """
    sample = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_cells)
        .collect()
    )
    C = np.array([list(r[0]) for r in sample], dtype="float64")
    emb = _as_double(vec_col)
    cells = F.array(
        *[
            F.struct(dot(emb, _lit_vec(C[i])).alias("score"), F.lit(i).alias("cell"))
            for i in range(len(C))
        ]
    )
    assigned = df.withColumn("ivf_cell", F.array_max(cells)["cell"])
    return assigned, C


def ivf_topk(
    assigned: DataFrame, centroids: np.ndarray, query_vec, k: int = 10,
    nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe best cells only, exact cosine inside them."""
    qv = np.asarray([float(x) for x in query_vec])
    scores = centroids @ qv
    probe = [int(i) for i in np.argsort(-scores)[:nprobe]]
    cand = assigned.filter(F.col("ivf_cell").isin(probe))
    emb = _as_double(vec_col)
    sim = cosine(emb, _lit_vec(qv))
    w = Window.orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        cand.select(id_col, sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
