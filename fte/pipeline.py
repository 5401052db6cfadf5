"""FeaturePlan: assemble a feature matrix from registered extractors.

The engine's only IR (SURVEY.md §3.4): an ordered list of
(name, builder) applied to the transcripts DataFrame, then projected to
keys + feature columns. Because every library extractor uses the same
WindowSpec, chaining builders composes into ONE Catalyst plan with one
conv_id shuffle — the assembly "join" of the reference
(pandas column-concat [U: featurehub/evaluation/client.py]) is free
here: features are computed in place on the fact table, aligned by
construction, no join needed for same-grain features.

As-of-grained features (anchors at arbitrary ts) go through
``fte.operators.asof`` instead and equi-join back on
(conv_id, turn_idx) when mixed with turn-grain features.

Serve-time safety: ``build_matrix(serve=True)`` refuses leaky
extractors (lead/future frames) — the structural replacement for the
reference's held-out-data re-execution defense (SURVEY.md §3.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from fte.registry import FeatureRegistry

KEYS = ("conv_id", "turn_idx", "ts")


def build_matrix(
    df: DataFrame,
    registry: FeatureRegistry,
    features: Sequence[str] | None = None,
    serve: bool = False,
    keys: Sequence[str] = KEYS,
    pack_vector: bool = False,
) -> DataFrame:
    names = list(features) if features is not None else sorted(registry.features)
    out = df
    out_cols: list[str] = []
    for name in names:
        spec = registry.get(name)
        if serve and spec.leaky:
            raise ValueError(
                f"feature {name!r} is leaky (uses future turns); refused at serve time"
            )
        out = spec.builder(out)
        out_cols.extend(spec.outputs)
    result = out.select(*keys, *out_cols)
    if pack_vector:
        numeric = [
            c for c in out_cols
            if dict(result.dtypes)[c] in ("int", "bigint", "double", "float", "smallint")
        ]
        result = result.withColumn(
            "feature_vector", F.array(*[F.col(c).cast("double") for c in numeric])
        )
    return result
