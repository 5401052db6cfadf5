"""Salted join / aggregate: result parity with the unsalted plan on a
whale-skewed input."""

from __future__ import annotations

import pandas as pd
import pytest

from fte.operators.skew import salted_group_count, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 1 whale key with 5000 rows + 50 normal keys with 10 rows
    rows = [("whale", i) for i in range(5000)]
    for k in range(50):
        rows += [(f"k{k}", i) for i in range(10)]
    left = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]), "k string, v long")
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["whale"] + [f"k{i}" for i in range(50)],
                      "attr": range(51)}),
        "k string, attr long",
    )
    return left, right


def test_salted_join_matches_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").groupBy("k").count().toPandas()
    salted = salted_join(left, right, ["k"], salt=8).groupBy("k").count().toPandas()
    a = plain.sort_values("k").reset_index(drop=True)
    b = salted.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_salted_join_left_outer(spark, skewed):
    left, right = skewed
    right_missing = right.filter("k <> 'whale'")
    plain = left.join(right_missing, "k", "left").groupBy("k").count().toPandas()
    salted = salted_join(left, right_missing, ["k"], salt=4, how="left").groupBy("k").count().toPandas()
    pd.testing.assert_frame_equal(
        plain.sort_values("k").reset_index(drop=True),
        salted.sort_values("k").reset_index(drop=True),
    )


def test_salted_group_count(spark, skewed):
    left, _ = skewed
    got = salted_group_count(left, ["k"], salt=8).toPandas().set_index("k")["n"]
    assert got["whale"] == 5000
    assert got["k7"] == 10


def test_key_skew_report_finds_whale(spark, transcripts_df):
    """The synthetic whale conversation dominates the report and the
    shares sum to <=1 with counts matching a direct groupBy."""
    from fte.operators.skew import key_skew_report

    rep = key_skew_report(transcripts_df, "conv_id", top_n=5).toPandas()
    direct = (
        transcripts_df.groupBy("conv_id").count().orderBy("count", ascending=False)
        .limit(5).toPandas()
    )
    assert rep["n_rows"].tolist() == direct["count"].tolist()
    assert rep["key"].iloc[0] == direct["conv_id"].iloc[0]  # the whale
    n_total = transcripts_df.count()
    assert rep["share"].iloc[0] == rep["n_rows"].iloc[0] / n_total
    assert rep["share"].sum() <= 1.0
