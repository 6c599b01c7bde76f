"""Datadog search syntax translator — Condition::DatadogSearch subset
(/root/reference/src/conditions/mod.rs:23-37)."""

import pytest
from pyspark.sql import functions as F

from vector_spark.functions.datadog_search import datadog_search

from conftest import rows


def _logs(spark):
    return spark.createDataFrame(
        [
            (1, "error", "web-01", 5, "disk failure on web-01"),
            (2, "warn", "web-02", 12, "high latency"),
            (3, "info", "db-01", 3, "checkpoint complete"),
            (4, "error", "db-02", 20, "disk failure imminent"),
        ],
        "id long, status string, host string, count int, message string",
    )


def q(spark, query):
    return [r.id for r in _logs(spark).filter(datadog_search(query)).orderBy("id").collect()]


def test_field_equality(spark):
    assert q(spark, "status:error") == [1, 4]


def test_alternation(spark):
    assert q(spark, "status:(error OR warn)") == [1, 2, 4]


def test_wildcard(spark):
    assert q(spark, "host:web-*") == [1, 2]


def test_phrase_and_bare_word(spark):
    assert q(spark, '"disk failure"') == [1, 4]
    assert q(spark, "latency") == [2]


def test_boolean_combinators(spark):
    assert q(spark, "status:error AND host:db-*") == [4]
    assert q(spark, "status:info OR status:warn") == [2, 3]
    assert q(spark, "NOT status:error") == [2, 3]
    assert q(spark, "-status:error") == [2, 3]
    # juxtaposition is implicit AND
    assert q(spark, "status:error host:web-*") == [1]


def test_range_and_comparisons(spark):
    assert q(spark, "count:[3 TO 12]") == [1, 2, 3]
    assert q(spark, "count:>12") == [4]
    assert q(spark, "count:<=5") == [1, 3]


def test_parens_grouping(spark):
    assert q(spark, "(status:error OR status:warn) AND count:>10") == [2, 4]


def test_match_all_and_exists(spark):
    assert q(spark, "*:*") == [1, 2, 3, 4]
    assert q(spark, "host:*") == [1, 2, 3, 4]


def test_unsupported_raises(spark):
    with pytest.raises(ValueError, match="unbalanced"):
        datadog_search("(status:error")


def test_regex_literal(spark):
    df = spark.createDataFrame(
        [(1, "error code 42"), (2, "warning code 7"), (3, "all fine")],
        "id long, message string",
    )
    got = rows(df.filter(datadog_search(r"/code\s\d+/")), "id")
    assert got == [(1,), (2,)]
    got = rows(df.filter(datadog_search(r"message:/err.r/")), "id")
    assert got == [(1,)]


def test_fuzzy_match(spark):
    df = spark.createDataFrame(
        [(1, "kernel panic now"), (2, "kernal warning"), (3, "other")],
        "id long, message string",
    )
    # bare fuzzy: any token within edit distance 1 of 'kernel'
    got = rows(df.filter(datadog_search("kernel~1")), "id")
    assert got == [(1,), (2,)]
    df2 = spark.createDataFrame([(1, "prod-7"), (2, "staging")], "id long, env string")
    got = rows(df2.filter(datadog_search("env:prod-9~2")), "id")
    assert got == [(1,)]
