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


def test_log_to_metric_histogram_summary_specs(spark):
    """Histogram/Summary specs emit one-sample Distributions
    (log_to_metric.rs:431-470): Incremental kind, statistic tag, the
    field value as the single sample."""
    from vector_spark.operators import log_to_metric
    from vector_spark.operators.log_to_metric import MetricSpec

    df = spark.createDataFrame([(1, 12.5)], "event_id long, rt double")
    out = log_to_metric(
        df,
        [MetricSpec("histogram", "rt_hist", value=F.col("rt")),
         MetricSpec("summary", "rt_sum", value=F.col("rt"))],
        carry=["event_id"],
    ).collect()
    got = {r["name"]: (r["kind"], r["metric_type"], r["statistic"], r["value"])
           for r in out}
    assert got["rt_hist"] == ("incremental", "distribution", "histogram", 12.5)
    assert got["rt_sum"] == ("incremental", "distribution", "summary", 12.5)


def test_log_to_metric_all_mode(spark):
    """all_metrics mode (log_to_metric.rs:489-856): metric-shaped logs
    convert back to metrics; alphabetical first-present-key choice;
    invalid kind / missing name / malformed value object -> dropped."""
    import json as _json

    from vector_spark.operators import log_to_metric_all

    rows_ = [
        (0, _json.dumps({"name": "c", "kind": "incremental",
                         "counter": {"value": 2.5},
                         "tags": {"env": "p"}})),
        (1, _json.dumps({"name": "g", "kind": "absolute",
                         "gauge": {"value": -1.0},
                         "namespace": "nsX"})),
        (2, _json.dumps({"name": "s", "kind": "incremental",
                         "set": {"values": ["a", "b"]}})),
        (3, _json.dumps({"name": "d", "kind": "incremental",
                         "distribution": {
                             "samples": [{"value": 1.0, "rate": 3}],
                             "statistic": "summary"}})),
        (4, _json.dumps({"name": "h", "kind": "absolute",
                         "histogram": {
                             "buckets": [{"upper_limit": 2.0, "count": 5}],
                             "count": 5, "sum": 7.5}})),
        (5, _json.dumps({"name": "q", "kind": "absolute",
                         "summary": {
                             "quantiles": [{"quantile": 0.5, "value": 2.0}],
                             "count": 9, "sum": 18.0}})),
        # counter wins over gauge (alphabetical first-present key)
        (6, _json.dumps({"name": "both", "kind": "incremental",
                         "gauge": {"value": 9.0},
                         "counter": {"value": 4.0}})),
        (7, _json.dumps({"name": "badkind", "kind": "weird",
                         "counter": {"value": 1.0}})),
        (8, _json.dumps({"kind": "absolute", "gauge": {"value": 1.0}})),
        (9, _json.dumps({"name": "badstat", "kind": "incremental",
                         "distribution": {
                             "samples": [{"value": 1.0, "rate": 1}],
                             "statistic": "nope"}})),
        (10, _json.dumps({"name": "novalue", "kind": "incremental"})),
    ]
    df = spark.createDataFrame(rows_, "i long, message string")
    out = {r["i"]: r for r in
           log_to_metric_all(df, carry=["i"]).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4, 5, 6]
    assert (out[0]["metric_type"], out[0]["value"],
            dict(out[0]["tags"])) == ("counter", 2.5, {"env": "p"})
    assert (out[1]["metric_type"], out[1]["namespace"]) == ("gauge", "nsX")
    assert list(out[2]["set_values"]) == ["a", "b"]
    assert (out[3]["statistic"], out[3]["samples"][0]["rate"]) == ("summary", 3)
    assert (out[4]["agg_count"], out[4]["agg_sum"],
            out[4]["buckets"][0]["upper_limit"]) == (5, 7.5, 2.0)
    assert (out[5]["quantiles"][0]["quantile"], out[5]["agg_count"]) == (0.5, 9)
    assert (out[6]["metric_type"], out[6]["value"]) == ("counter", 4.0)


def test_metric_to_log_json_roundtrip_and_host_move(spark):
    """metric_to_log_json serializes the serde-metric shape and moves
    tags.host to the host column (metric_to_log.rs:283-335);
    log_to_metric_all inverts it exactly."""
    import json as _json

    from vector_spark.operators import log_to_metric_all, metric_to_log_json

    doc = _json.dumps({"name": "c", "kind": "incremental",
                       "counter": {"value": 2.5},
                       "tags": {"env": "p", "host": "web-1"}})
    df = spark.createDataFrame([(doc,)], "message string")
    m = log_to_metric_all(df)
    log = metric_to_log_json(m).collect()[0]
    assert log["host"] == "web-1"
    o = _json.loads(log["message"])
    assert o["counter"] == {"value": 2.5}
    assert o["tags"] == {"env": "p"}  # host removed from serialized tags
    assert "gauge" not in o  # absent objects omitted like serde
    back = log_to_metric_all(metric_to_log_json(m)).collect()[0]
    assert (back["name"], back["kind"], back["value"]) == ("c", "incremental", 2.5)
