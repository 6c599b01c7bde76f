"""aggregate mode semantics — mirrors the reference's exact-output mode
tests (/root/reference/src/transforms/aggregate.rs:359-1139:
sum/latest/count/min/max/mean/stdev/diff/auto)."""

import math

from vector_spark.operators import aggregate_metrics, aggregate_diff, tumbling_window

from conftest import rows, ts


def _metrics(spark):
    # two series (cpu, mem) across two 10s windows
    return spark.createDataFrame(
        [
            (1, "cpu", ts(0, 1), 1.0, "incremental"),
            (2, "cpu", ts(0, 4), 2.0, "incremental"),
            (3, "mem", ts(0, 2), 50.0, "absolute"),
            (4, "mem", ts(0, 8), 70.0, "absolute"),
            (5, "cpu", ts(0, 12), 8.0, "incremental"),
        ],
        "event_id long, name string, ts timestamp, value double, kind string",
    )


W0 = 1704067200  # 2024-01-01T00:00:00Z epoch; ts(0,1) falls in [W0, W0+10)


def test_sum_mode(spark):
    out = rows(aggregate_metrics(_metrics(spark), "sum", 10), "window_start", "name", "agg_value")
    assert out == [(W0, "cpu", 3.0), (W0, "mem", 120.0), (W0 + 10, "cpu", 8.0)]


def test_latest_mode_uses_order(spark):
    out = rows(
        aggregate_metrics(_metrics(spark), "latest", 10, order_col="event_id"),
        "window_start", "name", "agg_value",
    )
    assert out == [(W0, "cpu", 2.0), (W0, "mem", 70.0), (W0 + 10, "cpu", 8.0)]


def test_count_min_max_mean(spark):
    m = _metrics(spark)
    assert rows(aggregate_metrics(m, "count", 3600), "name", "agg_value") == [
        ("cpu", 3.0), ("mem", 2.0)]
    assert rows(aggregate_metrics(m, "max", 3600), "name", "agg_value") == [
        ("cpu", 8.0), ("mem", 70.0)]
    assert rows(aggregate_metrics(m, "min", 3600), "name", "agg_value") == [
        ("cpu", 1.0), ("mem", 50.0)]
    got = dict(rows(aggregate_metrics(m, "mean", 3600), "name", "agg_value"))
    assert math.isclose(got["cpu"], 11.0 / 3) and got["mem"] == 60.0


def test_stdev_population(spark):
    got = dict(rows(aggregate_metrics(_metrics(spark), "stdev", 3600), "name", "agg_value"))
    # population sigma of [1,2,8] = sqrt(var([1,2,8]))
    mu = 11.0 / 3
    var = sum((x - mu) ** 2 for x in (1, 2, 8)) / 3
    assert math.isclose(got["cpu"], math.sqrt(var))
    assert got["mem"] == 10.0


def test_auto_mode_kind_dispatch(spark):
    # incremental -> sum of deltas; absolute -> last write wins
    out = rows(
        aggregate_metrics(_metrics(spark), "auto", 3600, kind_col="kind", order_col="event_id"),
        "name", "agg_value",
    )
    assert out == [("cpu", 11.0), ("mem", 70.0)]


def test_diff_vs_previous_window(spark):
    out = rows(aggregate_diff(_metrics(spark), 10), "window_start", "name", "diff_value")
    assert out == [(W0, "cpu", None), (W0, "mem", None), (W0 + 10, "cpu", 5.0)]


def test_tumbling_window_alignment(spark):
    df = spark.createDataFrame([(ts(0, 0),), (ts(0, 9),), (ts(0, 10),)], "t timestamp")
    got = [r[0] for r in df.select(tumbling_window(df.t, 10)).collect()]
    assert got == [W0, W0, W0 + 10]


def test_summary_approx_within_rank_tolerance(spark):
    """approx=True (the sketch/100 TB path) returns a data value whose rank
    is within n/accuracy of the exact quantile — with accuracy >> n the
    approximation must land within one data-point gap of exact."""
    import random

    from vector_spark.operators.aggregate import aggregate_summary

    rng = random.Random(7)
    vals = [round(rng.uniform(0, 100), 2) for _ in range(2000)]
    df = spark.createDataFrame(
        [(ts(0, 0), "s", v) for v in vals], "ts timestamp, name string, value double"
    )
    exact = aggregate_summary(df, [0.5, 0.9], window_secs=3600).collect()[0]
    approx = aggregate_summary(df, [0.5, 0.9], window_secs=3600, approx=True).collect()[0]
    assert approx["count"] == exact["count"] == 2000
    assert approx["sum"] == exact["sum"]
    s = sorted(vals)
    for q, col in [(0.5, "q0_5"), (0.9, "q0_9")]:
        # rank tolerance: accuracy=10000, n=2000 -> within +-1 rank
        lo = s[max(0, int(q * 2000) - 2)]
        hi = s[min(1999, int(q * 2000) + 2)]
        assert lo <= approx[col] <= hi, (col, approx[col], lo, hi)
        assert abs(approx[col] - exact[col]) <= (hi - lo) + 0.01


def test_aggregate_sketch_error_bound(spark):
    """Gamma-bucket DDSketch analogue: every interior quantile is within
    gamma-1 = 2*eps (1.5625% at the default) relative error of the exact
    percentile; count/sum are exact; q=0/1 return exact min/max."""
    import datetime as dt

    from vector_spark.operators import aggregate_sketch, aggregate_summary

    rows_in = [
        ("m", dt.datetime(2024, 1, 1, 0, 0, i % 60), float(1 + (i * 37) % 997))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows_in, "name string, ts timestamp, value double")
    qs = [0.0, 0.5, 0.9, 0.99, 1.0]
    sk = aggregate_sketch(df, qs, window_secs=3600).collect()[0]
    ex = aggregate_summary(df, qs, window_secs=3600).collect()[0]
    assert sk["count"] == ex["count"] == 2000
    assert abs(sk["sum"] - ex["sum"]) < 1e-6
    assert sk["q0_0"] == ex["q0_0"] and sk["q1_0"] == ex["q1_0"]  # exact min/max
    for q in ("q0_5", "q0_9", "q0_99"):
        rel = abs(sk[q] - ex[q]) / abs(ex[q])
        assert rel <= 2.0 / 128 + 1e-9, (q, sk[q], ex[q], rel)


def test_aggregate_sketch_negative_and_zero_values(spark):
    """Negative values use mirrored keys; |v| <= min_value collapses to
    the zero bucket; quantiles stay within [min, max]."""
    import datetime as dt

    from vector_spark.operators import aggregate_sketch

    vals = [-100.0, -10.0, 0.0, 1e-12, 10.0, 100.0, 1000.0]
    rows_in = [
        ("m", dt.datetime(2024, 1, 1, 0, 0, i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows_in, "name string, ts timestamp, value double")
    r = aggregate_sketch(df, [0.0, 0.5, 1.0], window_secs=3600).collect()[0]
    assert r["q0_0"] == -100.0 and r["q1_0"] == 1000.0
    assert -100.0 <= r["q0_5"] <= 1000.0
    assert r["count"] == 7
