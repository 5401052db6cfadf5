"""Feature-engineering catalog queries: leakage-safe target encoding
and equal-frequency binning (fte/operators/encoding.py), with DuckDB
oracle twins. Appended after the 79 rotation-managed entries — the
driver window covers positions 0-49; these are judge/local-gated until
rotated in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_target_encode(spark, sf_dir):
    """Point-in-time target encoding of event_type by running mean of
    `value` over strictly PRIOR events of the same type (frame ends 1
    PRECEDING — a training row never sees its own target), plus the
    (smoothing=10, prior=0.5) smoothed encoding. The engine-level
    restatement of the groupby-expanding-mean pandas feature every
    FeatureHub-style user hand-writes, without its leakage foot-gun."""
    from fte.operators.encoding import target_encode

    e = _t(spark, sf_dir, "events")
    return target_encode(
        e, "event_type", "value", ["ts", "event_id"], smoothing=10.0, prior=0.5
    ).select("event_id", "event_type", "te_count", "te_mean", "te_smooth")


SQL_TARGET_ENCODE = """
SELECT event_id, event_type,
       CAST(COUNT(value) OVER w AS BIGINT) AS te_count,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
         / COUNT(value) OVER w AS te_mean,
       COALESCE(
         (CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE)
            + CAST(5.0 AS DOUBLE))
           / (COUNT(value) OVER w + CAST(10.0 AS DOUBLE)),
         CAST(0.5 AS DOUBLE)) AS te_smooth
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


def q_quantile_bin(spark, sf_dir):
    """Equal-frequency quartile binning of documents.n_chars — the
    discretization step of classic feature pipelines. exact=True here
    (interpolating percentile, integer inputs so the interpolation is
    FP-exact on both engines); the scale default is approx_percentile
    (mergeable t-digest)."""
    from fte.operators.encoding import quantile_bin

    d = _t(spark, sf_dir, "documents")
    return quantile_bin(d, "n_chars", n_bins=4, exact=True).select("doc_id", "bin")


SQL_QUANTILE_BIN = """
WITH b AS (
  SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS qb FROM documents
)
SELECT d.doc_id,
       CAST((CASE WHEN d.n_chars > b.qb[1] THEN 1 ELSE 0 END)
          + (CASE WHEN d.n_chars > b.qb[2] THEN 1 ELSE 0 END)
          + (CASE WHEN d.n_chars > b.qb[3] THEN 1 ELSE 0 END) AS BIGINT) AS bin
FROM documents d, b
"""


def q_feature_hash(spark, sf_dir):
    """Hashing-trick vectorization of documents (k=64 buckets, signed
    term counts) in sparse (doc_id, bucket, weight) form — vocab-free:
    no dictionary aggregate or broadcast at any corpus size. md5
    bucket/sign so DuckDB reproduces every weight exactly."""
    from fte.operators.encoding import feature_hash_rows

    d = _t(spark, sf_dir, "documents")
    return feature_hash_rows(d, "doc_id", "text", k=64)


SQL_FEATURE_HASH = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), '\S+')) AS tok
  FROM documents
)
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5(tok || '#fh42'), 1, 8)) AS BIGINT) % 64 AS BIGINT) AS bucket,
       CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(tok || '#fh42'), 9, 1)) AS BIGINT) % 2 = 0
                     THEN 1 ELSE -1 END) AS BIGINT) AS weight
FROM toks
GROUP BY 1, 2
"""


def catalog_fe():
    return {
        "target_encode": (q_target_encode, SQL_TARGET_ENCODE),
        "quantile_bin": (q_quantile_bin, SQL_QUANTILE_BIN),
        "feature_hash": (q_feature_hash, SQL_FEATURE_HASH),
    }
