"""Partitioned sink layout (days(ts) x bucket(url)) and codec parse
functions (csv/json deserializers, strptime timestamps)."""

import datetime as dt

from pyspark.sql import functions as F

from vector_spark.functions import parse_csv_line, parse_json_doc, parse_timestamp
from vector_spark.sinks import iceberg_available, read_partitioned, write_partitioned
from vector_spark.sources import generate_pages


def test_iceberg_not_in_sandbox(spark):
    # documents the fallback path actually exercised below
    assert iceberg_available(spark) is False


def test_write_partitioned_layout_and_pruning(spark, tmp_path):
    path = str(tmp_path / "pages_part")
    pages = generate_pages(spark, 2000, partitions=4)
    write_partitioned(pages, path, n_buckets=8)
    back = read_partitioned(spark, path)
    assert back.count() == 2000
    assert {"day", "bucket"} <= set(back.columns)
    # day partition pruning reaches the file listing (PartitionFilters)
    one_day = back.filter(F.col("day") == dt.date(2023, 11, 15))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:200]
    assert 0 < one_day.count() < 2000


def test_write_partitioned_dynamic_overwrite_idempotent(spark, tmp_path):
    path = str(tmp_path / "pages_redo")
    pages = generate_pages(spark, 500, partitions=2)
    write_partitioned(pages, path, n_buckets=4)
    write_partitioned(pages, path, n_buckets=4)  # redo: replaces, no dupes
    assert read_partitioned(spark, path).count() == 500


def test_parse_csv_line(spark):
    df = spark.createDataFrame([("7,hello,2.5",)], "line string")
    out = df.select(
        parse_csv_line(F.col("line"), "a INT, b STRING, c DOUBLE").alias("r")
    ).select("r.*").collect()[0]
    assert (out["a"], out["b"], out["c"]) == (7, "hello", 2.5)


def test_parse_json_doc(spark):
    df = spark.createDataFrame([('{"x": 1, "tags": ["p", "q"]}',)], "line string")
    out = df.select(
        parse_json_doc(F.col("line"), "x INT, tags ARRAY<STRING>").alias("r")
    ).select("r.*").collect()[0]
    assert out["x"] == 1 and out["tags"] == ["p", "q"]


def test_parse_timestamp_strptime(spark):
    df = spark.createDataFrame([("2024-03-05 07:08:09",)], "s string")
    out = df.select(parse_timestamp(F.col("s"), "%Y-%m-%d %H:%M:%S").alias("t")).collect()[0]
    assert out["t"] == dt.datetime(2024, 3, 5, 7, 8, 9)
    df = spark.createDataFrame([("05/Mar/2024",)], "s string")
    out = df.select(parse_timestamp(F.col("s"), "%d/%b/%Y").alias("t")).collect()[0]
    assert out["t"] == dt.datetime(2024, 3, 5)
