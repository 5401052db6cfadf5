"""fte — feature-transcript engine.

A brand-new PySpark-native feature-engineering engine with the
capabilities of HDI-Project/FeatureHub (collaborative feature-function
registry, validated evaluation, leakage-free feature matrices),
re-realized Spark-first over tables of multi-turn conversation
transcripts (conv_id, turn_idx, role, text, tool, ts).

Everything here is built on the public pyspark.sql DataFrame API:
declarative plans optimized by Catalyst, Arrow-vectorized pandas UDFs
where built-ins can't express the semantics, and NO per-row Python
UDFs anywhere in the hot path.

Reference parity notes cite HDI-Project/FeatureHub at path::symbol
granularity (the reference checkout was empty in this sandbox; see
SURVEY.md §0 for the citation policy).
"""

from fte.conf import get_spark
from fte.schema import TRANSCRIPTS_SCHEMA, ANCHORS_SCHEMA, LABELS_SCHEMA
from fte.registry import FeatureRegistry, feature

__all__ = [
    "get_spark",
    "TRANSCRIPTS_SCHEMA",
    "ANCHORS_SCHEMA",
    "LABELS_SCHEMA",
    "FeatureRegistry",
    "feature",
]

__version__ = "0.1.0"
