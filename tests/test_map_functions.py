"""Map-typed columns (SURVEY.md §2.B scalar functions, map family):
role→count maps per conversation built with map_from_entries, read
back with element_at/map_keys — JVM-only."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_role_count_map(spark, transcripts_df, transcripts_pdf):
    per_role = (
        transcripts_df.groupBy("conv_id", "role")
        .count()
        .groupBy("conv_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("role", "count")))
            ).alias("role_counts")
        )
    )
    out = per_role.select(
        "conv_id",
        F.element_at("role_counts", "user").alias("n_user"),
        F.size(F.map_keys("role_counts")).alias("n_roles"),
    ).toPandas().set_index("conv_id")

    ref = transcripts_pdf.groupby(["conv_id", "role"]).size().unstack(fill_value=0)
    for conv in ref.index[:20]:
        want = int(ref.loc[conv].get("user", 0))
        got = out.loc[conv, "n_user"]
        assert (got == want) or (want == 0 and got is None) or (
            got is not None and int(got) == want
        )
        assert int(out.loc[conv, "n_roles"]) == int((ref.loc[conv] > 0).sum())
