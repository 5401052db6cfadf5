"""TableIO — table-format seam (SURVEY.md §7-R1).

Design point: the transcripts table is Iceberg, hidden-partitioned by
``days(ts) × bucket(conv_id, N)`` with within-file sort order
``(conv_id, turn_idx)`` — at 10^12 turns that layout gives (a) ts-range
partition pruning for incremental/backfill jobs, (b) conv-bucket
pruning for anchor-driven as-of joins, (c) presorted files so the
conv_id window shuffle reads nearly-clustered input.

The Iceberg runtime jar is not available offline in this sandbox, so
the default backend is hive-style partitioned parquet with the SAME
layout (`ts_day=YYYY-MM-DD/conv_bucket=K/`) and dynamic partition
overwrite, which preserves both the pruning behavior and the
idempotent per-partition rewrite that checkpoint/resume relies on.
``IcebergIO`` activates when a catalog is configured
(`spark.sql.catalog.<name>` set and the jar on the classpath).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_BUCKETS = 8

PARTITION_COLS = ("ts_day", "conv_bucket")


def with_partition_cols(df: DataFrame, conv_col: str = "conv_id", ts_col: str = "ts",
                        n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Derive the physical partition columns: days(ts) × bucket(conv).

    conv_bucket uses a stable hash (xxhash64) so the same conversation
    always lands in the same bucket across runs and batches — required
    for idempotent overwrite and bucket-pruned as-of joins.
    """
    return df.withColumn("ts_day", F.date_format(F.col(ts_col), "yyyy-MM-dd")).withColumn(
        "conv_bucket", F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_buckets)).cast("int")
    )


@dataclass
class ParquetIO:
    """Hive-partitioned parquet backend (offline default)."""

    n_buckets: int = DEFAULT_BUCKETS

    def write(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        """Partitioned write; with mode='overwrite' and the session's
        dynamic partitionOverwriteMode (fte.conf), only the partitions
        present in ``df`` are replaced — the idempotent-resume
        primitive."""
        out = df
        missing = [c for c in PARTITION_COLS if c not in df.columns]
        if missing:
            out = with_partition_cols(df, n_buckets=self.n_buckets)
        (
            out.repartition(*[F.col(c) for c in PARTITION_COLS])
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.partitionBy(*PARTITION_COLS)
            .mode(mode)
            .parquet(path)
        )

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    def overwrite_partitions(self, df: DataFrame, path: str) -> None:
        self.write(df, path, mode="overwrite")


@dataclass
class IcebergIO:
    """Iceberg backend: same logical layout via hidden partitioning.

    Requires the iceberg-spark-runtime jar and a configured catalog;
    unavailable offline in this sandbox (SURVEY.md §0), kept as the
    production path.
    """

    catalog: str = "local"
    n_buckets: int = DEFAULT_BUCKETS

    def create_table_ddl(self, table: str) -> str:
        return (
            f"CREATE TABLE IF NOT EXISTS {self.catalog}.{table} ("
            "conv_id STRING NOT NULL, turn_idx INT NOT NULL, role STRING NOT NULL, "
            "text STRING NOT NULL, tool STRING, ts TIMESTAMP NOT NULL) USING iceberg "
            f"PARTITIONED BY (days(ts), bucket({self.n_buckets}, conv_id))"
        )

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        writer = df.writeTo(f"{self.catalog}.{table}")
        if mode == "overwrite":
            writer.overwritePartitions()
        else:
            writer.append()

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.format("iceberg").load(f"{self.catalog}.{table}")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...] = ("conv_id",),
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED table (Hive-style bucket metadata in the
    session catalog): both sides of a join bucketed by the same key
    and count sort-merge WITHOUT an Exchange — the co-located-join
    layout for repeated joins on conv_id (feature matrix ⋈ labels,
    anchors ⋈ turns) at 100 TB, where re-shuffling the fact table per
    job IS the job. Iceberg's bucket(conv_id, N) hidden partitioning
    (IcebergIO) carries the same property via storage-partitioned
    joins; this is the builtin-catalog twin that works offline.
    """
    (
        df.write.bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    lenient: bool = False,
    **options: str,
) -> DataFrame:
    """Declared-schema CSV scan (the reference's native ingest format:
    FeatureHub loads CSVs with pandas dtype inference [U: session
    _load_dataset]; at 100 TB schema inference is an EXTRA FULL PASS
    over the input, so this engine requires the schema and never
    infers).

    Strict by default (FAILFAST: one malformed row kills the job — the
    right default for curated ingest). ``lenient=True`` switches to
    PERMISSIVE with a ``_corrupt_record`` column so bad rows are
    quarantined for inspection instead of silently nulled: filter
    ``_corrupt_record IS NOT NULL`` to a reject sink.
    """
    from pyspark.sql import types as T

    opts = {"header": "true", "mode": "FAILFAST", **options}
    if lenient:
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
        opts["mode"] = "PERMISSIVE"
        opts["columnNameOfCorruptRecord"] = "_corrupt_record"
    return spark.read.options(**opts).schema(schema).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    lenient: bool = False,
    **options: str,
) -> DataFrame:
    """Declared-schema JSON-lines scan (the common chat-transcript
    export format). Same strict/lenient contract as read_csv."""
    from pyspark.sql import types as T

    opts = {"mode": "FAILFAST", **options}
    if lenient:
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
        opts["mode"] = "PERMISSIVE"
        opts["columnNameOfCorruptRecord"] = "_corrupt_record"
    return spark.read.options(**opts).schema(schema).json(path)


def table_io(spark: SparkSession, prefer_iceberg: bool = True):
    """Pick the backend: Iceberg when a catalog is live, else parquet."""
    if prefer_iceberg:
        try:
            for k in spark.sparkContext.getConf().getAll():
                if k[0].startswith("spark.sql.catalog.") and "iceberg" in k[1].lower():
                    return IcebergIO(catalog=k[0].split(".", 3)[3])
        except Exception:  # noqa: BLE001
            pass
    return ParquetIO()


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet directory into
    ⌈total_bytes / target⌉ files. Streaming/incremental sinks and
    per-batch partition overwrites accrete thousands of KB-sized files;
    at 100 TB the resulting open/seek storm dominates scan time (every
    file costs a NameNode/S3 round trip + footer read), so periodic
    compaction IS a pipeline operator, not ops trivia.

    Sizing reads only FILE METADATA on the driver (a directory listing
    — no data moves through it; this offline impl walks a local path,
    the cluster variant lists via the Hadoop FileSystem API — same
    O(#files) driver cost either way); the rewrite itself is one
    distributed pass: scan → repartition(n) → write to ``dst``. The caller swaps
    ``dst`` in atomically (rename / metastore pointer flip) so readers
    never see a half-compacted table; writing beside the source keeps
    the operation idempotent — a crashed compaction just reruns.
    Returns (files_before, files_after).
    """
    from pathlib import Path

    files = [p for p in Path(src).rglob("*.parquet") if p.is_file()]
    total = sum(p.stat().st_size for p in files)
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src)
    df.repartition(n_out).write.mode("overwrite").parquet(dst)
    files_after = len([p for p in Path(dst).rglob("*.parquet") if p.is_file()])
    return len(files), files_after


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: tuple[str, ...] = ("conv_id",),
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Range-clustered write: repartitionByRange + sortWithinPartitions
    on the cluster key before writing, so each output file covers a
    NARROW, non-overlapping key range and every file/row-group carries
    tight min/max statistics. Readers filtering on the key then skip
    whole files from parquet footer stats alone — the data-skipping
    layout (Z-order's 1-D special case) that turns a point/range query
    over 100 TB into a handful of file reads. The range partitioner
    samples key quantiles, so skewed keys still yield balanced files.
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )
