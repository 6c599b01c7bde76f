"""route / exclusive_route semantics — mirrors the reference's behavior
tests (/root/reference/tests/behavior/transforms/route.toml and
src/transforms/route.rs:39-54 multi-match copy semantics)."""

from pyspark.sql import functions as F

from vector_spark.operators import route, exclusive_route, UNMATCHED
from vector_spark.operators.route import routed_union

from conftest import rows


def _events(spark):
    return spark.createDataFrame(
        [
            (1, "error", 10.0),
            (2, "signup", 200.0),   # matches signup AND high_value
            (3, "click", 50.0),     # matches nothing
            (4, "error", 300.0),    # matches errors AND high_value
        ],
        "event_id long, event_type string, value double",
    )


CONDS = {
    "errors": "event_type = 'error'",
    "high_value": "value > 150",
    "signup": "event_type = 'signup'",
}


def test_route_multi_match_copies(spark):
    ports = route(_events(spark), CONDS)
    assert rows(ports["errors"], "event_id") == [(1,), (4,)]
    assert rows(ports["high_value"], "event_id") == [(2,), (4,)]
    assert rows(ports["signup"], "event_id") == [(2,)]
    assert rows(ports[UNMATCHED], "event_id") == [(3,)]


def test_route_unmatched_disabled(spark):
    ports = route(_events(spark), CONDS, unmatched=False)
    assert UNMATCHED not in ports


def test_routed_union_equals_port_union(spark):
    """The single-pass routed_union must equal the per-port filters —
    the routed-row set-equality invariant from BASELINE.json."""
    df = _events(spark)
    ports = route(df, CONDS)
    flat = rows(routed_union(df, CONDS), "event_id", "route")
    expect = sorted(
        (r.event_id, name)
        for name, port in ports.items()
        for r in port.select("event_id").collect()
    )
    assert flat == expect
    # event 4 appears on two routes (copy semantics, route.rs:39-54)
    assert (4, "errors") in flat and (4, "high_value") in flat


def test_exclusive_route_first_match_wins(spark):
    out = rows(exclusive_route(_events(spark), CONDS), "event_id", "route")
    assert out == [
        (1, "errors"),
        (2, "high_value"),  # high_value precedes signup in dict order
        (3, UNMATCHED),
        (4, "errors"),
    ]


def test_route_null_condition_is_no_match(spark):
    df = spark.createDataFrame([(1, None), (2, "error")], "event_id long, event_type string")
    ports = route(df, {"errors": "event_type = 'error'"})
    assert rows(ports["errors"], "event_id") == [(2,)]
    assert rows(ports[UNMATCHED], "event_id") == [(1,)]
