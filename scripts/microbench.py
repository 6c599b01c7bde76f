#!/usr/bin/env python
"""Per-operator micro-benchmarks — the criterion-bench analogue.

Reference: /root/reference/benches/{remap,transform/{route,dedupe,filter,
reduce}}.rs measure per-event operator cost. Here: each operator over a
materialized 2M-row log table, warmed, min of 2 samples, events/sec.

    python scripts/microbench.py          # one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(os.environ.get("SPARK_GRAFT_MICRO_ROWS", "2000000"))


def main() -> None:
    from pyspark.sql import functions as F

    from vector_spark.operators import (
        dedupe,
        enrich_equi,
        exclusive_route,
        filter_events,
        hash_replace,
        log_to_metric,
        reduce_sessions,
        sample,
        tag_cardinality_limit,
        throttle,
    )
    from vector_spark.operators.log_to_metric import MetricSpec
    from vector_spark.operators.route import routed_union
    from vector_spark.session import get_spark

    spark = get_spark("microbench")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/vector_spark_micro_{N}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        df = spark.range(0, N, 1, 64).select(
            F.col("id").alias("event_id"),
            F.concat(F.lit("host"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).cast("string")).alias("host"),
            F.concat(F.lit("msg-"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)).cast("string")).alias("message"),
            F.element_at(
                F.array(F.lit("error"), F.lit("click"), F.lit("purchase"), F.lit("view")),
                (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(4)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(100000)) / 100.0).alias("value"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.pmod(F.xxhash64("id", F.lit(5)), F.lit(86400))).alias("ts"),
            F.format_string('{"k": %d}', F.pmod(F.xxhash64("id", F.lit(6)), F.lit(100)).cast("int")).alias("props"),
        )
        df.write.mode("overwrite").parquet(path)
    events = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(t, f"cat{i}") for i, t in enumerate(["error", "click", "purchase", "view"])],
        "event_type string, category string",
    )
    routes = {"errors": "event_type = 'error'", "big": "value > 600",
              "purchases": "event_type = 'purchase'"}

    def _geoip(ev):
        from vector_spark.operators import enrich_ip_range
        from vector_spark.sources import geoip_dim

        ip = F.format_string(
            "10.%d.%d.%d",
            F.pmod(F.xxhash64("event_id", F.lit(7)), F.lit(128)).cast("int"),
            F.pmod(F.xxhash64("event_id", F.lit(8)), F.lit(256)).cast("int"),
            F.pmod(F.xxhash64("event_id", F.lit(9)), F.lit(256)).cast("int"),
        )
        gd = geoip_dim(spark).select("ip_start", "ip_end", "country", "region")
        return enrich_ip_range(ev.withColumn("ip", ip), gd, "ip")

    def _alb(ev):
        from vector_spark.functions import parse_aws_alb_log

        line = F.format_string(
            'http 2024-01-01T00:00:00.000000Z app/lb/%d 10.0.0.%d:%d - 0.001 0.002 0.000 '
            '200 200 %d %d "GET http://x/%d HTTP/1.1" "ua-%d" - - arn:tg/%d "Root=1-%d"',
            F.col("event_id"), (F.col("event_id") % 250).cast("int"),
            (F.col("event_id") % 60000).cast("int") + F.lit(1024),
            F.col("event_id") % 4096, F.col("event_id") % 8192,
            F.col("event_id"), F.col("event_id"), F.col("event_id"), F.col("event_id"),
        )
        p = parse_aws_alb_log(line)
        return ev.select("event_id", *[v.alias(k) for k, v in p.items()])

    ops = {
        "remap_parse_json": lambda: events.select(
            "event_id", F.get_json_object("props", "$.k").cast("int").alias("k"),
            F.upper("event_type").alias("ET"),
        ),
        "filter": lambda: filter_events(events, "value > 500"),
        "route_multi": lambda: routed_union(events, routes),
        "exclusive_route": lambda: exclusive_route(events, routes),
        "dedupe_first": lambda: dedupe(events, match=["message"], order_by="event_id"),
        "sample_hash_1in10": lambda: sample(events, 10, key_field="event_id"),
        "throttle": lambda: throttle(events, 50, 3600, ["host"], ts_col="ts", order_col="event_id"),
        "reduce_sessions": lambda: reduce_sessions(
            events, ["host"], {"v": ("sum", "value")}, ts_col="ts", gap_secs=300,
            order_col=["ts", "event_id"],
        ),
        "log_to_metric": lambda: log_to_metric(
            events, [MetricSpec("counter", "n"),
                     MetricSpec("gauge", "v", value=F.col("value"))],
            carry=["event_id"],
        ),
        "hash_replace": lambda: hash_replace(events, ["message"], order_col="event_id"),
        "tag_cardinality_limit": lambda: tag_cardinality_limit(
            events, ["event_type"], value_limit=2, order_col="event_id"),
        "enrich_broadcast": lambda: enrich_equi(events, dim, [("event_type", "event_type")]),
        "window_aggregate": lambda: events.groupBy(
            (F.floor(F.unix_timestamp("ts") / 10) * 10).alias("w"), "event_type"
        ).agg(F.count(F.lit(1)), F.sum("value")),
        "enrich_geoip_range": lambda: _geoip(events),
        "reduce_max_events": lambda: reduce_sessions(
            events, ["host"], {"v": ("sum", "value")}, ts_col="ts", gap_secs=300,
            order_col=["ts", "event_id"], max_events=5,
        ),
        "hash_replace_2keys": lambda: hash_replace(
            events, ["message", "event_type"], order_col="event_id"),
        "hash_replace_2keys_projected": lambda: hash_replace(
            events, ["message", "event_type"], order_col="event_id", project=True),
        "parse_aws_alb": lambda: _alb(events),
    }

    def _sketch(ev):
        from vector_spark.operators import aggregate_sketch

        return aggregate_sketch(ev, [0.5, 0.95], window_secs=3600,
                                series_cols=["event_type"])

    def _syslog_tables(ev):
        from vector_spark.functions import to_syslog_facility, to_syslog_level

        return ev.select(
            "event_id",
            to_syslog_level(F.col("event_id") % 8).alias("lvl"),
            to_syslog_facility(F.col("event_id") % 24).alias("fac"),
        )

    def _seeded_random(ev):
        from vector_spark.functions import random_int_seeded

        return ev.select(
            "event_id", random_int_seeded(F.col("event_id"), 0, 1000).alias("r")
        )

    ops["aggregate_sketch"] = lambda: _sketch(events)
    ops["to_syslog_tables"] = lambda: _syslog_tables(events)
    ops["seeded_random"] = lambda: _seeded_random(events)

    results = {}
    for name, mk in ops.items():
        df = mk()
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        results[name] = {"sec": round(best, 3), "events_per_sec": round(N / best)}

    print(json.dumps({"rows": N, "cores": spark.sparkContext.defaultParallelism,
                      "ops": results}))


if __name__ == "__main__":
    main()
