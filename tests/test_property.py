"""Property-based tests (hypothesis) — the analogue of the reference's
proptest/arbitrary layer (SURVEY §5.4): operator invariants that must hold
for ANY input, not just the hand-written goldens.

Each property runs real Spark jobs, so example counts are kept small; the
row strategies are deterministic under hypothesis's seed control.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from vector_spark.operators import dedupe, exclusive_route, route, sample
from vector_spark.operators.reduce import reduce_sessions
from vector_spark.operators.route import routed_union

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

events = st.lists(
    st.tuples(
        st.integers(0, 50),            # value
        st.sampled_from(["a", "b", "c"]),  # kind
        st.integers(0, 120),           # seconds offset
    ),
    min_size=1,
    max_size=30,
).map(lambda rows: [
    (i, v, k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
    for i, (v, k, s) in enumerate(rows)
])

SCHEMA = "event_id long, value long, kind string, ts timestamp"
CONDS = {"big": "value > 25", "a_kind": "kind = 'a'"}


@given(rows=events)
@settings(**SETTINGS)
def test_route_partitions_cover_input_exactly(spark, rows):
    """exclusive_route: every event lands on exactly one port; route
    (multi-match): port membership == independent filter membership."""
    df = spark.createDataFrame(rows, SCHEMA)
    labeled = exclusive_route(df, CONDS)
    assert labeled.count() == len(rows)
    assert labeled.select("event_id").distinct().count() == len(rows)

    ports = route(df, CONDS)
    for name, cond in CONDS.items():
        expect = {r.event_id for r in df.filter(cond).collect()}
        got = {r.event_id for r in ports[name].collect()}
        assert got == expect


@given(rows=events)
@settings(**SETTINGS)
def test_routed_union_consistent_with_ports(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    flat = routed_union(df, CONDS)
    ports = route(df, CONDS)
    flat_pairs = {(r.event_id, r.route) for r in flat.collect()}
    port_pairs = {
        (r.event_id, name) for name, p in ports.items() for r in p.collect()
    }
    assert flat_pairs == port_pairs


@given(rows=events)
@settings(**SETTINGS)
def test_dedupe_first_is_minimal_representative(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = dedupe(df, match=["kind", "value"], order_by="event_id").collect()
    # one row per distinct key, and it is the min-event_id witness
    by_key = {}
    for i, v, k, _ in rows:
        by_key.setdefault((k, v), i)
    assert {(r.kind, r.value): r.event_id for r in out} == by_key


@given(rows=events)
@settings(**SETTINGS)
def test_reduce_sessions_conserves_events(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = reduce_sessions(
        df, ["kind"], {"n": ("count", "event_id"), "vsum": ("sum", "value")},
        ts_col="ts", gap_secs=30, order_col=["ts", "event_id"],
    ).collect()
    assert sum(r["n"] for r in out) == len(rows)           # no event lost
    assert sum(r["vsum"] for r in out) == sum(v for _, v, _, _ in rows)
    for r in out:
        assert r["ts"] <= r["ts_end"]


@given(rows=events, rate=st.sampled_from([1, 2, 4]))
@settings(**SETTINGS)
def test_sample_membership_is_stable(spark, rows, rate):
    df = spark.createDataFrame(rows, SCHEMA)
    a = {r.event_id for r in sample(df, rate, key_field="event_id").collect()}
    b = {r.event_id for r in sample(df.repartition(3), rate, key_field="event_id").collect()}
    assert a == b
    if rate == 1:
        assert a == {r[0] for r in rows}
