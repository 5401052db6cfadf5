"""TableIO: physical layout (days(ts) × bucket(conv_id)), dynamic
partition overwrite idempotence, and partition pruning at the scan."""

from __future__ import annotations

import re

import pytest
from pathlib import Path

from fte.io import ParquetIO, table_io, with_partition_cols
from fte.schema import TRANSCRIPTS_SCHEMA


def test_layout_and_roundtrip(spark, transcripts_pdf, tmp_path):
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA)
    io = ParquetIO(n_buckets=4)
    path = str(tmp_path / "transcripts")
    io.write(df, path)

    days = [p.name for p in Path(path).iterdir() if p.name.startswith("ts_day=")]
    assert days, "expected hive ts_day=... directories"
    buckets = [p.name for p in (Path(path) / days[0]).iterdir() if p.name.startswith("conv_bucket=")]
    assert buckets, "expected conv_bucket=... subdirectories"

    back = io.read(spark, path)
    assert back.count() == df.count()
    # same conv always lands in the same bucket
    assert (
        back.groupBy("conv_id").agg({"conv_bucket": "count"}).count()
        == back.select("conv_id", "conv_bucket").distinct().count()
    )


def test_partition_pruning(spark, transcripts_pdf, tmp_path):
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA)
    io = ParquetIO(n_buckets=4)
    path = str(tmp_path / "t")
    io.write(df, path)
    one_day = with_partition_cols(df, n_buckets=4).select("ts_day").head()[0]
    scan = io.read(spark, path).filter(f"ts_day = '{one_day}' and conv_bucket = 2")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ts_day" in m.group(1) and "conv_bucket" in m.group(1), plan[:500]


def test_dynamic_overwrite_idempotent(spark, transcripts_pdf, tmp_path):
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA)
    io = ParquetIO(n_buckets=4)
    path = str(tmp_path / "t")
    io.write(df, path)
    n = io.read(spark, path).count()
    # re-write ONE bucket's data; total row count must not change
    part = with_partition_cols(df, n_buckets=4).filter("conv_bucket = 1")
    io.overwrite_partitions(part, path)
    assert io.read(spark, path).count() == n


def test_table_io_fallback_is_parquet(spark):
    assert isinstance(table_io(spark), ParquetIO)


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def test_iceberg_io_roundtrip_when_jar_present(spark, transcripts_pdf, tmp_path):
    """Ready-gate for the IcebergIO live path (VERDICT r1: env-blocked —
    no iceberg-spark-runtime jar offline). SKIPS in this sandbox; the
    moment a jar lands on the classpath it exercises DDL (hidden
    days(ts) x bucket(conv_id) partitioning), overwritePartitions, and
    the format read, end-to-end."""
    if not _iceberg_on_classpath(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath (offline sandbox)")
    from fte.io import IcebergIO

    spark.conf.set("spark.sql.catalog.ftetest", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ftetest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ftetest.warehouse", str(tmp_path / "wh"))
    io = IcebergIO(catalog="ftetest", n_buckets=4)
    spark.sql(io.create_table_ddl("db.transcripts"))
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA)
    io.write(df, "db.transcripts", mode="append")
    got = io.read(spark, "db.transcripts")
    assert got.count() == len(transcripts_pdf)
    # idempotent partition overwrite: rewrite everything, count stable
    io.write(df, "db.transcripts", mode="overwrite")
    assert io.read(spark, "db.transcripts").count() == len(transcripts_pdf)


def test_bucketed_join_has_no_exchange(spark, transcripts_pdf, tmp_path):
    """Co-located join: two tables bucketed by conv_id with the same
    bucket count must sort-merge join with ZERO Exchange (the layout
    that makes repeated fact-table joins affordable at scale)."""
    import re

    from fte.io import write_bucketed

    # warehouse.dir is a static conf — managed tables land in the
    # session default (./spark-warehouse, gitignored); DROP TABLE
    # removes the data
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPTS_SCHEMA)
    left = df.selectExpr("conv_id", "turn_idx", "role")
    right = df.selectExpr("conv_id", "turn_idx", "length(text) AS textlen")
    write_bucketed(left, "b_left", n_buckets=4)
    write_bucketed(right, "b_right", n_buckets=4)
    try:
        joined = spark.table("b_left").join(spark.table("b_right"), ["conv_id", "turn_idx"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not re.findall(r"Exchange hashpartitioning", plan), plan
        assert joined.count() == len(transcripts_pdf)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_csv_jsonl_roundtrip_declared_schema(spark, tmp_path):
    """CSV and JSONL ingest with a DECLARED schema (never inferSchema —
    inference is an extra full pass at 100 TB) reproduce the parquet
    table exactly, timestamps included."""
    from fte.io import read_csv, read_jsonl

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    csv_dir, json_dir = str(tmp_path / "ev_csv"), str(tmp_path / "ev_json")
    # default CSV/JSON timestamp formats truncate to milliseconds;
    # transcripts carry microseconds (TIMESTAMP_NTZ in Spark 4)
    us = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    fmt = {"timestampFormat": us, "timestampNTZFormat": us}
    src.write.option("header", "true").options(**fmt).csv(csv_dir)
    src.write.options(**fmt).json(json_dir)

    for rd, path in ((read_csv, csv_dir), (read_jsonl, json_dir)):
        back = rd(spark, path, src.schema, **fmt)
        assert back.schema == src.schema
        a = back.orderBy("event_id").toPandas()
        b = src.orderBy("event_id").toPandas()
        assert a.equals(b), rd.__name__


def test_csv_lenient_quarantines_corrupt_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from fte.io import read_csv

    p = tmp_path / "bad.csv"
    p.write_text(
        "id,n\n"
        "1,10\n"
        "oops,not_a_number\n"
        "2,20\n"
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("n", T.LongType())]
    )
    ok = read_csv(spark, str(p), schema, lenient=True)
    rows = ok.orderBy("id").collect()
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    good = [r for r in rows if r["_corrupt_record"] is None]
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "oops,not_a_number"
    assert [(r["id"], r["n"]) for r in good] == [(1, 10), (2, 20)]

    import pytest as _pytest

    with _pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_csv(spark, str(p), schema).collect()
