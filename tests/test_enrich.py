"""Enrichment-table semantics — Equals (case in/sensitive), BetweenDates,
find_table_row strictness (/root/reference/lib/enrichment/src/lib.rs:20-76)."""

import pytest

from pyspark.sql import functions as F

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


def test_find_table_row_errors_on_ambiguity_lazily(spark):
    """The ambiguity check is plan-embedded: building the lookup runs NO
    Spark job (topology compile stays lazy — job-group listener assert);
    the ambiguous dim errors at action time."""
    dim = spark.createDataFrame([("k", 1), ("k", 2)], "key string, v int")
    df = spark.createDataFrame([("k",)], "key string")
    sc = spark.sparkContext
    sc.setJobGroup("ftr_compile", "find_table_row build must be lazy")
    out = find_table_row(df, dim, [("key", "key")])
    compile_jobs = sc.statusTracker().getJobIdsForGroup("ftr_compile")
    sc.setJobGroup(None, None)
    assert list(compile_jobs) == []
    with pytest.raises(Exception, match="ambiguous"):
        out.collect()


def test_find_table_row_unique_dim_passes(spark):
    dim = spark.createDataFrame([("k", 1), ("j", 2)], "key string, v int")
    df = spark.createDataFrame([("k",), ("j",)], "key string")
    out = find_table_row(df, dim, [("key", "key")])
    assert rows(out, "key", "v") == [("j", 2), ("k", 1)]


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


def test_enrich_ip_range_lookup(spark):
    """GeoIP-style range join: in-range IPs get the range's attributes,
    out-of-range IPs null out; boundary IPs are inclusive both ends."""
    from vector_spark.operators import enrich_ip_range
    from vector_spark.sources import geoip_dim

    df = spark.createDataFrame(
        [
            (1, "10.0.0.0"),        # first range, lower bound
            (2, "10.11.255.255"),   # first range, upper bound
            (3, "10.12.0.1"),       # second range
            (4, "10.119.255.255"),  # last covered address
            (5, "10.120.0.0"),      # uncovered -> nulls
            (6, "11.0.0.1"),        # outside 10/8 entirely
        ],
        "id long, ip string",
    )
    dim = geoip_dim(spark).select("ip_start", "ip_end", "country", "region")
    out = enrich_ip_range(df, dim, "ip")
    got = rows(out, "id", "country", "region")
    assert got == [
        (1, "C00", "R0"), (2, "C00", "R0"), (3, "C01", "R1"),
        (4, "C09", "R4"), (5, None, None), (6, None, None),
    ]


def test_enrich_ip_range_numeric_and_plan(spark):
    """numeric=True path; the physical plan must be a broadcast HASH join
    (block equi-key), never BroadcastNestedLoopJoin — the 100 TB guarantee."""
    from vector_spark.operators import enrich_ip_range
    from vector_spark.sources import geoip_dim

    df = spark.createDataFrame(
        [(1, (10 << 24) + (5 << 16) + 7)], "id long, ip long"
    )
    dim = geoip_dim(spark).select(
        "net_start", "net_end", "country", "region"
    )
    out = enrich_ip_range(
        df, dim, "ip", start_col="net_start", end_col="net_end", numeric=True
    )
    assert rows(out, "id", "country") == [(1, "C00")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_enrich_ip_range_in_topology(spark):
    from vector_spark.sources import geoip_dim
    from vector_spark.topology import compile_topology

    spec = {
        "sources": {
            "ev": {
                "type": "inline",
                "rows": [(1, "10.3.2.1"), (2, "10.125.0.1")],
                "schema": "id long, client_ip string",
            }
        },
        "transforms": {
            "geo": {
                "type": "enrich",
                "inputs": ["ev"],
                "table": "geoip",
                "ip_range": {"ip": "client_ip"},
            }
        },
        "sinks": {"out": {"type": "memory", "inputs": ["geo"]}},
    }
    dim = geoip_dim(spark).select("ip_start", "ip_end", "country", "region")
    res = compile_topology(spec).build(spark, tables={"geoip": dim}).run()
    got = {r.id: r.country for r in res["out"]}
    assert got == {1: "C00", 2: None}


def test_enrich_ip6_range_rejects_overwide_range(spark):
    """A dim range coarser than the blocking must fail with the embedded
    assert (plan-level guard), not explode into millions of rows."""
    import pytest
    from pyspark.sql import functions as F

    from vector_spark.operators import enrich_ip6_range

    wide = spark.createDataFrame(
        [("20010000" + "0" * 24, "2001ffff" + "f" * 24, "X")],
        "ip_start_hex string, ip_end_hex string, country string",
    )
    facts = spark.createDataFrame([(1, "2001:0:0:1::2")], "id int, ip string")
    out = enrich_ip6_range(facts, wide, "ip", max_blocks_per_range=1024)
    with pytest.raises(Exception, match="spans > 1024"):
        out.collect()
    # in-bound spans still enrich (spans exactly at the cap boundary pass)
    ok = spark.createDataFrame(
        [("20010000" + "0" * 24, "200103ff" + "f" * 24, "Y")],
        "ip_start_hex string, ip_end_hex string, country string",
    )
    got = enrich_ip6_range(facts, ok, "ip", max_blocks_per_range=1024).collect()
    assert got[0].country == "Y"


def test_enrich_asof_latest_version_wins(spark):
    """As-of semantics: each fact row matches the LATEST dim version with
    valid_from <= ts; facts before the first version get nulls; facts
    after the last version get the last (open interval)."""
    from vector_spark.operators import enrich_asof

    dim = spark.createDataFrame(
        [("k", ts(2, 0), "v1"), ("k", ts(5, 0), "v2"), ("k", ts(8, 0), "v3")],
        "key string, valid_from timestamp, tag string",
    )
    df = spark.createDataFrame(
        [(1, "k", ts(1, 0)),   # before first version -> null
         (2, "k", ts(2, 0)),   # exactly at v1 (inclusive lower bound)
         (3, "k", ts(4, 59)),  # still v1
         (4, "k", ts(5, 0)),   # v2 starts (exclusive upper bound of v1)
         (5, "k", ts(30, 0)),  # after last -> v3 (open interval)
         (6, "x", ts(5, 0))],  # unknown key -> null
        "id long, key string, t timestamp",
    )
    out = enrich_asof(df, dim, ("key", "key"), ts_col="t",
                      dim_ts_col="valid_from")
    assert rows(out, "id", "tag") == [
        (1, None), (2, "v1"), (3, "v1"), (4, "v2"), (5, "v3"), (6, None)]
    # exactly one output row per fact row — the interval construction
    # guarantees no fan-out and no dedup pass
    assert out.count() == df.count()
    # a pre-existing fact column named _valid_to must survive (the helper
    # drop is alias-qualified to the dim side)
    df2 = df.withColumn("_valid_to", F.lit("keep-me"))
    out2 = enrich_asof(df2, dim, ("key", "key"), ts_col="t",
                       dim_ts_col="valid_from")
    assert "_valid_to" in out2.columns
    assert out2.select("_valid_to").distinct().collect()[0][0] == "keep-me"


def test_enrich_asof_is_broadcast_hash_join(spark):
    """The plan must be a broadcast HASH join on the key (interval as a
    residual) — never a BroadcastNestedLoopJoin, and no exchange on the
    fact side."""
    from vector_spark.operators import enrich_asof

    dim = spark.createDataFrame(
        [("k", ts(2, 0), "v1")], "key string, valid_from timestamp, tag string")
    df = spark.createDataFrame(
        [(1, "k", ts(3, 0))], "id long, key string, t timestamp")
    out = enrich_asof(df, dim, ("key", "key"), ts_col="t",
                      dim_ts_col="valid_from")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # zero fact-side shuffle: every Exchange (the dim window's shuffle,
    # the broadcast build) must sit INSIDE the broadcast subtree, which
    # the plan prints after the BroadcastExchange operator
    import re

    bcast_idx = plan.index("BroadcastExchange")
    for m in re.finditer(r"\bExchange\b", plan):
        assert m.start() >= bcast_idx, plan[:m.start()][-300:]
