"""Round bench: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Queries are materialized through the `noop` sink so Catalyst cannot
prune the work (a bare count() would let the optimizer drop window
columns). The flagship feature-matrix job runs over a deterministic
synthetic transcripts table (materialized once to /tmp, reused across
runs) and reports turns/sec alongside the per-query seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fte.conf import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline subset: one per operator family (stable across rounds so
# BENCH_r{N} values stay comparable)
HEADLINE = [
    "sessionize",
    "session_stats",
    "rolling_counts",
    "asof_join",
    "asof_join_merge",
    "role_freq_running",
    "user_stats",
    "range_join",
    "pivot_user_types",
    "tpch_pricing",
    "revenue_by_segment",
    "doc_text_stats",
    "doc_quality",
    "lang_id",
    "minhash_neardup",
    "knn_bruteforce",
    "knn_batch",
    "emb_top_pairs_gemm",
    "pandas_udaf_median",
]

# round-2 additions, timed and reported per-query but EXCLUDED from the
# headline total so BENCH_r{N} totals stay comparable round-over-round
EXTRA = [
    "training_pairs",
    "sft_render",
    "repetition_stats",
    "pii_redact",
    "doc_chunks",
    "bm25_topk",
    "decontaminate",
    "unigram_xent",
    "source_mix",
    # round-3 additions (canonical_per_cluster is deliberately absent:
    # its exact n-gram-Jaccard ground truth is all-pairs quadratic —
    # a 10k-doc corpus at sf0.1 would dominate the bench; the operator
    # itself is cluster-count-bound and oracle-gated at sf0.01)
    "segment_dedup",
    "bm25_batch",
    "token_fertility",
    "ivf_knn_batch",
    "sft_spans",
    "shuffle_order",
    # round-4 additions
    "target_encode",
    "quantile_bin",
    "feature_hash",
    "cv_folds",
    "temporal_split",
    "zscore",
    "drift_psi",
    "oof_target_encode",
    "weighted_sample",
    "sample_per_group",
    "minmax_scale",
    "robust_scale",
    # round-5 additions (pca_variance is deliberately absent: its
    # driver-side eigendecomposition makes the timing numpy-bound,
    # not an engine measurement; emb_covariance times the same
    # distributed reduction)
    "role_transition",
    "response_latency",
    "turn_runs",
    "count_encode",
    "loo_target_encode",
    "woe_encode",
    "feature_corr",
    "mutual_info",
    "column_profile",
    "emb_covariance",
    "emb_quantize",
    "quant_knn",
    "incremental_neardup",
    "funnel",
    "cohort_retention",
    "autocorr",
    "fuzzy_join",
    "incremental_agg",
    "chi2_independence",
]

# synthetic transcript scale per sf dir (turns ≈ n_convs × ~15)
N_CONVS = {"sf0.001": 400, "sf0.01": 4000, "sf0.1": 40000}


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_min(df, runs: int = 5) -> float:
    """Min-of-N wall time: the sandbox host has bursty co-tenant load
    (see BENCH/BASELINE.md; observed single runs 1.2s-7.6s for the
    SAME plan under loadavg 13), so min-of-5 — a single run can be
    6x off and min-of-3 still caught a 4.7x outlier in round 2."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        _noop(df)
        best = min(best, time.time() - t0)
    return best


def bench_transcripts(spark, tag: str) -> tuple[float, int]:
    """Flagship: full serve-time feature matrix over synthetic
    transcripts (scan → one conv_id shuffle → all window features →
    noop sink). Returns (seconds, n_turns)."""
    from fte.features import build_default_registry
    from fte.pipeline import build_matrix
    from fte.schema import TRANSCRIPTS_SCHEMA
    from fte.synth import gen_transcripts_df

    n_convs = N_CONVS.get(tag, 4000)
    path = f"/tmp/fte_bench_transcripts_{n_convs}.parquet"
    if not Path(path, "_SUCCESS").exists():
        gen_transcripts_df(spark, n_convs).write.mode("overwrite").parquet(path)
    df = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)
    n_turns = df.count()
    reg = build_default_registry()
    feats = [n for n, s in reg.features.items() if not s.leaky]
    mat = build_matrix(df, reg, features=feats, serve=True)
    _noop(mat)  # warm-up
    return _time_min(mat), n_turns


def main() -> int:
    from fte.queries import catalog

    spark = get_spark(
        "fte-bench",
        master=f"local[{CPUS}]",
        extra_confs={
            # cores, not 3x cores: at sf0.1 (513k turns) partitions of
            # ~16k rows already amortize task overhead, and tripling
            # them measured SLOWER (16.3s vs 10.3s total) — the 3x rule
            # only pays at bench_scaling's 12M-turn size where the
            # whale conversation skews one partition
            "spark.sql.shuffle.partitions": str(max(CPUS, 8)),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    tag = Path(SF_DIR).name
    cat = catalog()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn, _sql = cat[name]
        # build the plan ONCE; warm-up materializes codegen + any
        # operator-internal checkpoints, the timed run measures
        # steady-state execution of the same plan
        df = fn(spark, SF_DIR)
        _noop(df)  # warm-up: codegen + operator-internal checkpoints
        times[name] = round(_time_min(df), 3)

    fm_sec, n_turns = bench_transcripts(spark, tag)
    times["feature_matrix"] = round(fm_sec, 3)

    total = round(sum(times.values()), 3)

    for name in EXTRA:
        fn, _sql = cat[name]
        df = fn(spark, SF_DIR)
        _noop(df)  # warm-up
        times[name] = round(_time_min(df), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": tag,
                "cpus": CPUS,
                "feature_matrix_turns": n_turns,
                "feature_matrix_turns_per_sec": round(n_turns / fm_sec, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
