"""A8 evaluation harness: distributed closed-form CV model scoring.

The reference's submit → re-execute → metric loop
[U: featurehub/modeling/model.py] — fold assembly, one-pass normal-
equation fits, codegen scoring, rank AUC, registry write-back."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fte.evaluation import (
    binary_metrics,
    crossval_evaluate,
    fit_ridge,
    rank_features,
    regression_metrics,
    ridge_fitter,
)


@pytest.fixture(scope="module")
def lin_df(spark):
    rng = np.random.default_rng(5)
    n = 4000
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i % 400}" for i in range(n)],
            "x1": rng.normal(size=n),
            "x2": rng.normal(size=n),
        }
    )
    pdf["y"] = 2.0 * pdf.x1 - 3.0 * pdf.x2 + 1.0
    pdf["y_noisy"] = pdf["y"] + rng.normal(scale=0.1, size=n)
    return spark.createDataFrame(pdf).cache()


def test_fit_ridge_recovers_exact_weights(spark, lin_df):
    """Noise-free linear data -> the one-pass normal-equation fit
    recovers (2, -3, 1) to solver precision, independent of
    partitioning (sums are associative)."""
    w = fit_ridge(lin_df, ["x1", "x2"], "y")
    np.testing.assert_allclose(w, [2.0, -3.0, 1.0], atol=1e-6)
    w2 = fit_ridge(lin_df.repartition(13), ["x1", "x2"], "y")
    np.testing.assert_allclose(w, w2, atol=1e-9)


def test_crossval_regression_metrics(spark, lin_df):
    """CV on near-noise-free data: r2 ~ 1 per fold; metrics keys and
    per-fold structure are as the registry expects."""
    res = crossval_evaluate(lin_df, ["x1", "x2"], "y_noisy", n_folds=4)
    assert len(res["folds"]) == 4
    for m in res["folds"]:
        assert m["r2"] > 0.99 and m["mse"] < 0.02
    assert res["mean"]["r2"] > 0.99


def test_regression_metrics_match_numpy(spark, lin_df):
    scored = ridge_fitter()(lin_df, ["x1"], "y_noisy")(lin_df)
    got = regression_metrics(scored, "y_noisy")
    pdf = scored.select("_score", "y_noisy").toPandas()
    e = pdf["_score"] - pdf["y_noisy"]
    assert np.isclose(got["mse"], float((e**2).mean()), rtol=1e-9)
    assert np.isclose(got["mae"], float(e.abs().mean()), rtol=1e-9)
    sst = float(((pdf["y_noisy"] - pdf["y_noisy"].mean()) ** 2).sum())
    assert np.isclose(got["r2"], 1.0 - float((e**2).sum()) / sst, rtol=1e-6)


def test_binary_auc_matches_direct_mann_whitney(spark):
    """Rank AUC (midranks) == direct numpy Mann-Whitney, including
    ties in the score column."""
    rng = np.random.default_rng(11)
    n = 600
    y = (rng.uniform(size=n) < 0.4).astype(float)
    score = np.round(y * 0.3 + rng.uniform(size=n) * 0.7, 2)  # ties via rounding
    df = spark.createDataFrame(
        pd.DataFrame({"_score": score, "lab": y})
    )
    got = binary_metrics(df, "lab")
    order = np.argsort(score, kind="mergesort")
    ranks = np.empty(n)
    sorted_scores = score[order]
    i = 0
    pos = 1
    while i < n:
        j = i
        while j < n and sorted_scores[j] == sorted_scores[i]:
            j += 1
        ranks[order[i:j]] = (pos + (pos + j - i - 1)) / 2.0
        pos += j - i
        i = j
    npos, nneg = int(y.sum()), int((1 - y).sum())
    auc = (ranks[y == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert np.isclose(got["auc"], auc, rtol=1e-12)
    assert np.isclose(got["accuracy"], ((score >= 0.5) == y).mean(), rtol=1e-12)


def test_rank_features_orders_by_planted_signal(spark, lin_df):
    """A feature carrying the label's signal must outrank pure noise
    — the FeatureHub leaderboard property."""
    rng = np.random.default_rng(3)
    df = lin_df.withColumn("noise", F.rand(7))
    ranking = rank_features(df, ["x1", "noise"], "y_noisy", n_folds=3)
    assert ranking[0]["feature"] == "x1"
    assert ranking[0]["value"] > ranking[1]["value"] + 0.1
    assert len(ranking[0]["folds"]) == 3


def test_session_evaluate_cv_writes_registry_metrics(spark, transcripts_df, tmp_path):
    """End-to-end A8 loop on the transcripts fixture: label planted on
    text length -> the text-stats feature scores far above the
    time-of-day feature; per-fold metrics land in the registry and in
    to_metadata_df's cv_metrics column; meta_dir gets cv_metrics.json."""
    import json

    from fte.features.library import build_default_registry
    from fte.session import Session

    reg = build_default_registry()
    sess = Session(
        spark, transcripts_df, registry=reg, meta_dir=str(tmp_path / "meta")
    )
    labels = transcripts_df.select(
        "conv_id",
        "turn_idx",
        (F.length("text").cast("double") * 0.01 + 3.0).alias("y"),
    )
    res = sess.evaluate_cv(
        labels, features=["f_text_scalars", "f_time_of_day"], n_folds=3
    )
    assert res["f_text_scalars"]["mean"]["r2"] > 0.999  # textlen IS the label
    assert res["f_text_scalars"]["mean"]["r2"] > res["f_time_of_day"]["mean"]["r2"] + 0.5
    assert "__all__" in res
    # registry write-back with per-fold granularity
    assert len(reg.metrics["f_text_scalars"]["folds"]) == 3
    md = reg.to_metadata_df(spark).toPandas().set_index("name")
    stored = json.loads(md.loc["f_text_scalars", "cv_metrics"])
    assert stored["mean"]["r2"] > 0.999
    assert md.loc["f_session", "cv_metrics"] is None  # unevaluated stays null
    assert json.loads((tmp_path / "meta" / "cv_metrics.json").read_text())


def test_record_metrics_unknown_feature_raises(spark):
    from fte.registry import FeatureRegistry

    with pytest.raises(KeyError):
        FeatureRegistry().record_metrics("nope", {"mean": {}})


def test_binned_auc_close_to_exact(spark):
    """The scale path (histogram Mann-Whitney, no global sort) must
    track the exact midrank AUC closely on continuous scores."""
    import numpy as np

    from fte.evaluation import binary_metrics

    rng = np.random.default_rng(17)
    n = 4000
    y = (rng.random(n) < 0.4).astype("float64")
    # informative but noisy scores -> AUC well inside (0.5, 1)
    s = y * 0.8 + rng.standard_normal(n) * 0.7
    df = spark.createDataFrame(
        [(float(si), float(yi)) for si, yi in zip(s, y)], "_score double, label double"
    )
    exact = binary_metrics(df, "label", exact=True)
    binned = binary_metrics(df, "label", exact=False, n_bins=65536)
    assert 0.6 < exact["auc"] < 0.95
    assert abs(binned["auc"] - exact["auc"]) < 1e-3
    assert binned["accuracy"] == exact["accuracy"]


def test_calibration_metrics(spark):
    import numpy as np

    from fte.evaluation import calibration_metrics

    rng = np.random.default_rng(23)
    n = 2000
    p = rng.random(n)
    y = (rng.random(n) < p).astype("float64")  # perfectly calibrated scores
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(p, y)], "_score double, label double"
    )
    brier, table = calibration_metrics(df, "label", n_bins=10)
    assert np.isclose(brier, float(np.mean((p - y) ** 2)))
    rows = {r["bin"]: r for r in table.collect()}
    assert set(rows) == set(range(10))
    # calibrated: per-bin frac_pos tracks mean_score
    for r in rows.values():
        assert abs(r["frac_pos"] - r["mean_score"]) < 0.12


def test_sliced_metrics_match_numpy(spark):
    import numpy as np

    from fte.evaluation import sliced_metrics

    rng = np.random.default_rng(29)
    rows = []
    for sl, bias in [("a", 0.0), ("b", 2.0)]:
        y = rng.standard_normal(300)
        s = y + bias + rng.standard_normal(300) * 0.1
        rows += [(sl, float(si), float(yi)) for si, yi in zip(s, y)]
    df = spark.createDataFrame(rows, "seg string, _score double, label double")
    out = {r["slice"]: r for r in sliced_metrics(df, "label", "seg").collect()}
    assert out["b"]["mse"] > out["a"]["mse"] + 3.0  # the biased slice surfaces
    # numpy parity on one slice
    y = np.array([r[2] for r in rows if r[0] == "a"])
    s = np.array([r[1] for r in rows if r[0] == "a"])
    assert np.isclose(out["a"]["mse"], np.mean((s - y) ** 2))
    assert np.isclose(out["a"]["r2"], 1 - ((s - y) ** 2).sum() / ((y - y.mean()) ** 2).sum())


def test_sliced_metrics_zero_variance_slice_null_r2(spark):
    from fte.evaluation import sliced_metrics

    df = spark.createDataFrame(
        [("c", 1.0, 5.0), ("c", 2.0, 5.0)], "seg string, _score double, label double"
    )
    (row,) = sliced_metrics(df, "label", "seg").collect()
    assert row["r2"] is None
