"""throttle, log_to_metric, metric_to_log, tag_cardinality_limit,
hash_replace, filter — exact-output unit tests mirroring the reference's
inline transform tests (SURVEY.md §5 layer 1)."""

from pyspark.sql import functions as F

from vector_spark.operators import (
    filter_events,
    hash_replace,
    log_to_metric,
    metric_to_log,
    tag_cardinality_limit,
    throttle,
)
from vector_spark.operators.log_to_metric import MetricSpec

from conftest import rows, ts


def test_throttle_threshold_per_key_window(spark):
    df = spark.createDataFrame(
        [(i, "k1", ts(0, i)) for i in range(5)]
        + [(10, "k2", ts(0, 0))]
        + [(20, "k1", ts(30, 0))],  # next window -> bucket resets
        "event_id long, key string, ts timestamp",
    )
    out = throttle(df, threshold=2, window_secs=60, key_cols=["key"],
                   ts_col="ts", order_col="event_id")
    assert rows(out, "event_id") == [(0,), (1,), (10,), (20,)]


def test_throttle_exclude_bypass(spark):
    df = spark.createDataFrame(
        [(i, "k", ts(0, i), i == 4) for i in range(5)],
        "event_id long, key string, ts timestamp, vip boolean",
    )
    out = throttle(df, 1, 60, ["key"], ts_col="ts", order_col="event_id",
                   exclude=F.col("vip"))
    assert rows(out, "event_id") == [(0,), (4,)]


def test_log_to_metric_counter_gauge_skip(spark):
    df = spark.createDataFrame(
        [(1, "purchase", 9.5), (2, "click", None)],
        "event_id long, etype string, amount double",
    )
    out = log_to_metric(
        df,
        [
            MetricSpec("counter", "events_total"),
            MetricSpec("counter", "revenue", value=F.col("amount")),  # null -> skipped
            MetricSpec("gauge", "amount_g", value=F.col("amount"),
                       when=F.col("etype") == "purchase"),
        ],
        carry=["event_id"],
    )
    got = rows(out, "event_id", "name", "metric_type", "kind", "value")
    assert got == [
        (1, "amount_g", "gauge", "absolute", 9.5),
        (1, "events_total", "counter", "incremental", 1.0),
        (1, "revenue", "counter", "incremental", 9.5),
        (2, "events_total", "counter", "incremental", 1.0),
    ]


def test_metric_to_log_roundtrip(spark):
    df = spark.createDataFrame(
        [("requests", "incremental", "7.0")], "name string, kind string, value string"
    )
    out = metric_to_log(df).select("message").collect()[0][0]
    assert out == "metric name=requests kind=incremental value=7.0"


def test_tag_cardinality_drop_tag(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "a")], "event_id long, tag string"
    )
    out = tag_cardinality_limit(df, ["tag"], value_limit=2, order_col="event_id")
    got = rows(out, "event_id", "tag")
    # first two distinct values (a, b) kept; c nulled
    assert got == [(1, "a"), (2, "b"), (3, None), (4, "a")]


def test_tag_cardinality_drop_event(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "a")], "event_id long, tag string"
    )
    out = tag_cardinality_limit(df, ["tag"], value_limit=2, order_col="event_id",
                                action="drop_event")
    assert rows(out, "event_id") == [(1,), (2,), (4,)]


def test_hash_replace_repeats_become_hash_only(spark):
    df = spark.createDataFrame(
        [(1, "payload"), (2, "payload"), (3, "other")], "event_id long, body string"
    )
    out = rows(hash_replace(df, ["body"], order_col="event_id"),
               "event_id", "body", "body_hash")
    import hashlib
    h = hashlib.md5(b"payload").hexdigest()
    assert out[0] == (1, "payload", h)
    assert out[1] == (2, None, h)  # repeat: raw value removed, hash kept
    assert out[2][1] == "other"


def test_filter(spark):
    df = spark.createDataFrame([(1, 10), (2, 99)], "event_id long, v int")
    assert rows(filter_events(df, "v > 50"), "event_id") == [(2,)]
    assert rows(filter_events(df, F.col("v") > 50), "event_id") == [(2,)]


def test_remap_with_errors_dropped_port(spark):
    from vector_spark.operators import remap_with_errors

    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "not json"), (3, '{"other": 1}')],
        "event_id long, props string",
    )
    ports = remap_with_errors(
        df,
        {"k": "CAST(get_json_object(props, '$.k') AS INT)"},
        component_id="parse_k",
    )
    assert [r.event_id for r in ports["ok"].collect()] == [1]
    dropped = {r.event_id: r.dropped for r in ports["dropped"].collect()}
    assert set(dropped) == {2, 3}
    assert dropped[2]["component_id"] == "parse_k"
    assert "'k'" in dropped[2]["reason"]
    # drop_on_error mode discards instead of rerouting
    only_ok = remap_with_errors(
        df, {"k": "CAST(get_json_object(props, '$.k') AS INT)"},
        reroute_dropped=False,
    )
    assert list(only_ok) == ["ok"]
    # empty `required` -> no row can error; single ok port, no crash
    none_required = remap_with_errors(
        df, {"k": "CAST(get_json_object(props, '$.k') AS INT)"}, required=[]
    )
    assert list(none_required) == ["ok"]
    assert none_required["ok"].count() == 3


def test_throttle_excluded_rows_consume_no_tokens(spark):
    # vip event arrives first; it must NOT use up the key's budget
    df = spark.createDataFrame(
        [(0, "k", ts(0, 0), True), (1, "k", ts(0, 1), False), (2, "k", ts(0, 2), False)],
        "event_id long, key string, ts timestamp, vip boolean",
    )
    out = throttle(df, 1, 60, ["key"], ts_col="ts", order_col="event_id",
                   exclude=F.col("vip"))
    assert rows(out, "event_id") == [(0,), (1,)]


def test_hash_replace_multi_column_projection_path(spark):
    """project=True ranks over the narrow projection and joins flags back —
    results identical to per-column window semantics."""
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "x")],
        "event_id long, body string, tag string",
    )
    out = {r.event_id: r for r in hash_replace(
        df, ["body", "tag"], order_col="event_id", project=True).collect()}
    assert out[1]["body"] == "a" and out[2]["body"] is None
    assert out[3]["body"] == "b"
    assert out[1]["tag"] == "x" and out[3]["tag"] is None
    assert out[2]["tag"] == "y"
    assert out[2]["body_hash"] == out[1]["body_hash"]  # hash always present
    assert list(out[1].asDict()) == [
        "event_id", "body", "tag", "body_hash", "tag_hash"
    ]
