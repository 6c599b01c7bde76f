"""Enrichment-table semantics — Equals (case in/sensitive), BetweenDates,
find_table_row strictness (/root/reference/lib/enrichment/src/lib.rs:20-76)."""

import pytest

from vector_spark.operators import enrich_equi, enrich_between, find_table_row

from conftest import rows, ts


def _dim(spark):
    return spark.createDataFrame(
        [("com", "na"), ("ORG", "eu")], "tld string, region string"
    )


def test_equi_left_join_with_null_path(spark):
    df = spark.createDataFrame([(1, "com"), (2, "edu")], "id long, tld string")
    out = enrich_equi(df, _dim(spark), [("tld", "tld")])
    assert rows(out, "id", "region") == [(1, "na"), (2, None)]


def test_equi_case_insensitive(spark):
    df = spark.createDataFrame([(1, "org"), (2, "CoM")], "id long, tld string")
    out = enrich_equi(df, _dim(spark), [("tld", "tld")], case_insensitive=True)
    assert rows(out, "id", "region") == [(1, "eu"), (2, "na")]


def test_between_dates_inclusive(spark):
    dim = spark.createDataFrame(
        [("d", ts(0, 0), ts(10, 0), "in-window")],
        "key string, valid_from timestamp, valid_to timestamp, tag string",
    )
    df = spark.createDataFrame(
        [(1, "d", ts(0, 0)), (2, "d", ts(10, 0)), (3, "d", ts(11, 0))],
        "id long, key string, t timestamp",
    )
    out = enrich_between(df, dim, ("key", "key"), ts_col="t")
    # boundaries inclusive (lib.rs:24-28); outside -> null
    assert rows(out, "id", "tag") == [(1, "in-window"), (2, "in-window"), (3, None)]


def test_find_table_row_errors_on_ambiguity(spark):
    dim = spark.createDataFrame([("k", 1), ("k", 2)], "key string, v int")
    df = spark.createDataFrame([("k",)], "key string")
    with pytest.raises(ValueError, match="ambiguous"):
        find_table_row(df, dim, [("key", "key")])


def test_find_table_row_first_pick_is_deterministic(spark):
    dim = spark.createDataFrame([("k", 2), ("k", 1)], "key string, v int")
    df = spark.createDataFrame([("k",)], "key string")
    out = find_table_row(df, dim, [("key", "key")], on_ambiguous="first",
                         order_dim_by="v")
    assert rows(out, "v") == [(1,)]


def test_enrich_constant(spark):
    from pyspark.sql import functions as F

    from vector_spark.operators import enrich_constant

    df = spark.createDataFrame([(1,)], "id long")
    out = enrich_constant(df, {"region": "us-east-1", "az_num": 2,
                                "derived": F.col("id") + 1}).collect()[0]
    assert (out["region"], out["az_num"], out["derived"]) == ("us-east-1", 2, 2)
