"""Cross-validated feature evaluation — FeatureHub's A8 loop,
re-realized data-side.

The reference's core user loop is submit → re-execute → METRIC: an
evaluator fits an sklearn decision tree with k-fold CV over the feature
matrix and posts the scores back to the registry
[U: featurehub/modeling/model.py::Model.compute_metrics_cv,
 featurehub/evaluation/future.py]. sklearn is out of engine scope
(SURVEY §2.A A8); what the ENGINE owes that loop is everything except
the tree: fold assembly, per-fold train/test matrices, a distributed
fit of a closed-form model, distributed scoring and metrics, and the
registry write-back. All of that is here:

- folds: grouped entity-key hash (``with_fold`` — rows of one
  conversation never straddle train/test);
- model: ridge-regularized LINEAR least squares fit by NORMAL
  EQUATIONS — X'X (d×d) and X'y (d) are plain sums, computed in ONE
  distributed aggregate pass over the train fold (map-side combined;
  d = |features|+1, so the driver solve is a numpy d×d — microseconds,
  and the only driver data is O(d²), never O(rows));
- scoring: the fitted weights come back as COLUMN LITERALS —
  Σ wᵢ·xᵢ + b is whole-stage-codegen arithmetic, no UDF, no
  broadcast;
- metrics: mse/mae/r2 in one aggregate; for binary labels also
  accuracy@0.5 and rank-based AUC (Mann-Whitney with midranks — the
  only sort is over ONE test fold's scores);
- write-back: ``FeatureRegistry.record_metrics`` / Session meta dir.

A custom model rides the same seam: pass ``fitter=`` returning any
``(test_df) -> DataFrame-with-_score`` scorer — e.g. one wrapping
``fte.operators.scoring.score_with_model`` for a worker-cached python
model. The default stays closed-form so the whole loop is
deterministic and cluster-scale (every step is aggregates + column
arithmetic; nothing materializes rows on the driver).

Scale shape at 100 TB: k folds × one aggregate pass each over the
matrix (each pass map-side combines to d² partials per task), plus one
metric aggregate per fold. No per-fold shuffle of the matrix itself:
train/test are filters on the precomputed fold column, so Catalyst
prunes at the scan when the matrix is written partitioned by fold.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Callable

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from fte.operators.sampling import with_fold


def fit_ridge(
    train: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    reg: float = 1e-6,
) -> np.ndarray:
    """Closed-form ridge fit: solve (X'X + λI)w = X'y with X'X and X'y
    accumulated in ONE distributed aggregate (d(d+3)/2+1 sum
    expressions, all map-side combined). Returns w of length d+1
    (intercept last, via the constant-1 column). Driver data: O(d²)."""
    cols = [F.col(c).cast("double") for c in feature_cols] + [F.lit(1.0)]
    d = len(cols)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(cols[i] * cols[j]).alias(f"_xx_{i}_{j}"))
    y = F.col(label_col).cast("double")
    aggs += [F.sum(cols[i] * y).alias(f"_xy_{i}") for i in range(d)]
    row = train.agg(*aggs).first()
    XX = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            XX[i, j] = XX[j, i] = row[f"_xx_{i}_{j}"] or 0.0
    Xy = np.array([row[f"_xy_{i}"] or 0.0 for i in range(d)])
    XX += reg * np.eye(d)
    return np.linalg.solve(XX, Xy)


def _linear_scorer(
    feature_cols: Sequence[str], w: np.ndarray
) -> Callable[[DataFrame], DataFrame]:
    """Score = Σ wᵢ·xᵢ + b as pure column arithmetic (codegen)."""

    def score(df: DataFrame) -> DataFrame:
        expr = F.lit(float(w[-1]))
        for c, wi in zip(feature_cols, w[:-1]):
            expr = expr + F.lit(float(wi)) * F.col(c).cast("double")
        return df.withColumn("_score", expr)

    return score


def ridge_fitter(reg: float = 1e-6):
    """Default ``fitter``: distributed closed-form ridge (see
    ``fit_ridge``). Signature: (train, feature_cols, label_col) ->
    scorer mapping a DataFrame to itself + ``_score``."""

    def fit(train: DataFrame, feature_cols: Sequence[str], label_col: str):
        w = fit_ridge(train, feature_cols, label_col, reg=reg)
        return _linear_scorer(feature_cols, w)

    return fit


def regression_metrics(scored: DataFrame, label_col: str) -> dict:
    """mse / mae / r2 in one aggregate over the scored test fold."""
    y = F.col(label_col).cast("double")
    e = F.col("_score") - y
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(e * e).alias("mse"),
        F.avg(F.abs(e)).alias("mae"),
        F.avg(y).alias("_ybar"),
        F.sum(e * e).alias("_sse"),
        F.sum(y * y).alias("_syy"),
        F.sum(y).alias("_sy"),
    ).first()
    sst = (row["_syy"] or 0.0) - row["n"] * (row["_ybar"] or 0.0) ** 2
    r2 = 1.0 - (row["_sse"] or 0.0) / sst if sst > 0 else float("nan")
    return {"n": row["n"], "mse": row["mse"], "mae": row["mae"], "r2": r2}


def binary_metrics(
    scored: DataFrame, label_col: str, exact: bool = True, n_bins: int = 65536
) -> dict:
    """accuracy@0.5 and rank AUC (Mann-Whitney with midranks, exact
    under ties).

    ``exact=True`` ranks with an UNPARTITIONED window — the whole test
    fold flows through one task, which is fine for the fold sizes CV
    metrics are read at but is the single-task-sort shape this engine
    bans in data paths (CLAUDE.md / global top-k rule). At scale pass
    ``exact=False``: scores quantize onto ``n_bins`` equal-width bins
    (min/max from one broadcast aggregate) and the Mann-Whitney
    rank-sum is computed from the per-bin (n_pos, n_neg) histogram —
    every step a map-side-combined aggregate over ≤ n_bins rows, no
    global sort anywhere. Within-bin ties take the midrank, so the
    binned AUC errs only where opposite-label scores share a bin:
    |err| ≤ P(pair lands in same bin) ≤ 1/n_bins · (pairs at that
    resolution) — at 2^16 bins the pytest holds it inside 1e-3 on
    continuous scores.
    """
    y = F.col(label_col).cast("double")
    acc = scored.agg(
        F.avg(((F.col("_score") >= 0.5).cast("double") == y).cast("double")).alias("acc")
    ).first()["acc"]
    if exact:
        w_rank = Window.orderBy(F.col("_score"))
        w_tie = Window.partitionBy(F.col("_score"))
        ranked = scored.select(
            y.alias("_y"),
            (F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / 2.0).alias(
                "_midrank"
            ),
        )
        row = ranked.agg(
            F.sum(F.when(F.col("_y") == 1.0, F.col("_midrank"))).alias("_rpos"),
            F.sum((F.col("_y") == 1.0).cast("long")).alias("_npos"),
            F.sum((F.col("_y") == 0.0).cast("long")).alias("_nneg"),
        ).first()
        npos, nneg = row["_npos"] or 0, row["_nneg"] or 0
        auc = (
            ((row["_rpos"] or 0.0) - npos * (npos + 1) / 2.0) / (npos * nneg)
            if npos and nneg
            else float("nan")
        )
        return {"accuracy": acc, "auc": auc}
    # binned scale path: histogram of (bin, n_pos, n_neg), then the
    # U statistic from cumulative counts over <= n_bins rows
    ext = scored.agg(
        F.min("_score").alias("_mn"), F.max("_score").alias("_mx")
    )
    b = scored.crossJoin(F.broadcast(ext)).select(
        y.alias("_y"),
        F.when(
            F.col("_mx") > F.col("_mn"),
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (F.col("_score") - F.col("_mn"))
                    * F.lit(float(n_bins))
                    / (F.col("_mx") - F.col("_mn"))
                ),
            ),
        )
        .otherwise(F.lit(0))
        .alias("_bin"),
    )
    hist = (
        b.groupBy("_bin")
        .agg(
            F.sum((F.col("_y") == 1.0).cast("long")).alias("np"),
            F.sum((F.col("_y") == 0.0).cast("long")).alias("nn"),
        )
        .collect()
    )
    hist.sort(key=lambda r: r["_bin"])
    npos = sum(r["np"] for r in hist)
    nneg = sum(r["nn"] for r in hist)
    if not (npos and nneg):
        return {"accuracy": acc, "auc": float("nan")}
    u = 0.0
    neg_below = 0
    for r in hist:
        u += r["np"] * (neg_below + r["nn"] / 2.0)  # ties in bin: half credit
        neg_below += r["nn"]
    return {"accuracy": acc, "auc": u / (npos * nneg)}


def crossval_evaluate(
    matrix: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    entity_col: str = "conv_id",
    n_folds: int = 5,
    seed: int = 42,
    fitter: Callable | None = None,
    binary: bool = False,
) -> dict:
    """Grouped k-fold CV of a feature set over an assembled matrix.

    Per fold f: fit on rows with fold != f, score rows with fold == f,
    reduce metrics. Returns {"folds": [per-fold dicts], "mean": {...}}.
    ``fitter`` defaults to the closed-form distributed ridge; any
    callable with the same signature plugs in (including one built on
    ``score_with_model`` for worker-cached python models).
    """
    fit = fitter or ridge_fitter()
    folded = with_fold(matrix, entity_col, n_folds=n_folds, seed=seed).localCheckpoint(
        eager=False
    )  # pin: 2k consumers of one fold assignment
    folds = []
    for f in range(n_folds):
        train = folded.filter(F.col("fold") != f)
        test = folded.filter(F.col("fold") == f)
        scorer = fit(train, feature_cols, label_col)
        scored = scorer(test)
        m = regression_metrics(scored, label_col)
        if binary:
            m.update(binary_metrics(scored, label_col))
        m["fold"] = f
        folds.append(m)
    keys = [k for k in folds[0] if k != "fold"]
    mean = {
        k: float(np.nanmean([m[k] for m in folds])) for k in keys
    }
    return {"folds": folds, "mean": mean}


def rank_features(
    matrix: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    metric: str = "r2",
    higher_is_better: bool = True,
    **kw,
) -> list[dict]:
    """Single-feature CV evaluation of each candidate — FeatureHub's
    leaderboard view (each submitted feature carries its own score).
    Returns [{"feature", "metric", "value", "folds"}] sorted best
    first."""
    out = []
    for c in feature_cols:
        res = crossval_evaluate(matrix, [c], label_col, **kw)
        out.append(
            {
                "feature": c,
                "metric": metric,
                "value": res["mean"][metric],
                "folds": [m[metric] for m in res["folds"]],
            }
        )
    out.sort(key=lambda r: r["value"], reverse=higher_is_better)
    return out


def calibration_metrics(
    scored: DataFrame, label_col: str, n_bins: int = 10
) -> tuple[float, DataFrame]:
    """Probability-calibration view of a scored binary fold: the Brier
    score (one aggregate) plus the reliability table — per score-bin
    (bin, n, mean_score, frac_pos), the data behind a calibration
    curve. Scores are clamped to [0, 1] before binning (a linear
    scorer can leave the interval). Everything is one
    map-side-combined aggregate over ≤ n_bins keys."""
    y = F.col(label_col).cast("double")
    s = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("_score")))
    brier = scored.agg(F.avg((s - y) * (s - y)).alias("b")).first()["b"]
    binned = scored.select(
        y.alias("_y"),
        s.alias("_s"),
        F.least(F.lit(n_bins - 1), F.floor(s * F.lit(float(n_bins)))).cast("long").alias("bin"),
    )
    table = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("_s").alias("mean_score"),
        F.avg("_y").alias("frac_pos"),
    )
    return float(brier), table


def sliced_metrics(
    scored: DataFrame, label_col: str, slice_col: str
) -> DataFrame:
    """Per-slice regression metrics — the segment/fairness view of a
    scored fold (metrics per language, per source, per user segment).
    One grouped aggregate; |slices| output rows. r2 is NULL for a
    zero-variance slice."""
    y = F.col(label_col).cast("double")
    e = F.col("_score") - y
    g = scored.groupBy(F.col(slice_col).alias("slice")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(e * e).alias("mse"),
        F.avg(F.abs(e)).alias("mae"),
        F.sum(e * e).alias("_sse"),
        F.sum(y * y).alias("_syy"),
        F.sum(y).alias("_sy"),
    )
    n = F.col("n").cast("double")
    sst = F.col("_syy") - (F.col("_sy") * F.col("_sy")) / n
    return g.select(
        "slice", "n", "mse", "mae",
        F.when(sst > 0, F.lit(1.0) - F.col("_sse") / sst).alias("r2"),
    )
