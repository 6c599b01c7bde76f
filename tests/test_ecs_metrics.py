"""aws_ecs_metrics stats-document parser (parser.rs:1-560 semantics)."""

import json

from pyspark.sql import functions as F

from vector_spark.functions import parse_ecs_metrics


def _rows(spark, doc: str):
    df = spark.createDataFrame([(doc,)], "body string")
    out = df.select(
        F.explode(parse_ecs_metrics(F.col("body"))).alias("m")
    ).select("m.*").collect()
    return {
        (r["container_id"], r["name"], r["device"], r["op"], r["cpu"]):
            (r["mtype"], r["value"], r["ts_us"], r["container_name"])
        for r in out
    }


def test_ecs_full_document(spark):
    doc = json.dumps({
        "0cf54b87-f0f0-4044-b9d6-20dc54d5c414-4057181352": {
            "read": "2026-01-02T03:04:05.123456789Z",
            "name": "vector-run-7",
            "blkio_stats": {
                "io_service_bytes_recursive": [
                    {"major": 202, "minor": 26368, "op": "Read", "value": 0},
                    {"major": 202, "minor": 26368, "op": "Write", "value": 520192},
                ],
                "io_service_time_recursive": [
                    {"major": 202, "minor": 26368, "op": "Total", "value": 2000000000},
                ],
                "io_time_recursive": [
                    {"major": 202, "minor": 26368, "op": "", "value": 500},
                ],
            },
            "cpu_stats": {
                "cpu_usage": {
                    "total_usage": 2324920942,
                    "percpu_usage": [1111, 2222, 3333],  # 3rd past online_cpus
                    "usage_in_usermode": 510000000,
                    "usage_in_kernelmode": 190000000,
                },
                "system_cpu_usage": 2007100000000,
                "online_cpus": 2,
                "throttling_data": {
                    "periods": 4, "throttled_periods": 1,
                    "throttled_time": 500000000,
                },
            },
            "precpu_stats": {
                "cpu_usage": {"total_usage": 1.0},
                "online_cpus": 0,  # percpu must NOT emit at 0 cpus
            },
            "memory_stats": {
                "usage": 40120320,
                "max_usage": 47177728,
                "limit": 9223372036854771712,
                "stats": {
                    "cache": 21282816,
                    "rss": 19925004,
                    "pgfault": 31131,
                    "total_pgmajfault": 3,
                    "hierarchical_memory_limit": 536870912,
                },
            },
            "networks": {
                "eth1": {"rx_bytes": 329932716, "rx_packets": 224158,
                         "rx_errors": 0, "rx_dropped": 0,
                         "tx_bytes": 2001229, "tx_packets": 29201,
                         "tx_errors": 0, "tx_dropped": 0},
            },
        },
    })
    got = _rows(spark, doc)
    cid = "0cf54b87-f0f0-4044-b9d6-20dc54d5c414-4057181352"
    ts = 1767323045123456  # nanos clipped to micros
    assert all(k[0] == cid and v[2] == ts and v[3] == "vector-run-7"
               for k, v in got.items())

    # blkio: per-entry counters, device major:minor, op lowercased, scales
    assert got[(cid, "blkio_recursive_io_service_bytes_total",
                "202:26368", "read", None)][:2] == ("counter", 0.0)
    assert got[(cid, "blkio_recursive_io_service_bytes_total",
                "202:26368", "write", None)][:2] == ("counter", 520192.0)
    assert got[(cid, "blkio_recursive_io_service_time_seconds_total",
                "202:26368", "total", None)][:2] == ("counter", 2.0)
    assert got[(cid, "blkio_recursive_io_time_seconds_total",
                "202:26368", "", None)][:2] == ("counter", 0.5)

    # cpu: gauges/counters incl. throttled_time ns->s
    assert got[(cid, "cpu_online_cpus", None, None, None)][:2] == ("gauge", 2.0)
    assert got[(cid, "cpu_usage_system_jiffies_total", None, None, None)][1] == 2007100000000.0
    assert got[(cid, "cpu_usage_usermode_jiffies_total", None, None, None)][1] == 510000000.0
    assert got[(cid, "cpu_usage_kernelmode_jiffies_total", None, None, None)][1] == 190000000.0
    assert got[(cid, "cpu_usage_total_jiffies_total", None, None, None)][1] == 2324920942.0
    assert got[(cid, "cpu_throttling_periods_total", None, None, None)][1] == 4.0
    assert got[(cid, "cpu_throttled_periods_total", None, None, None)][1] == 1.0
    assert got[(cid, "cpu_throttled_time_seconds_total", None, None, None)][1] == 0.5

    # percpu: only indexes 0..online_cpus-1 (parser.rs:343-361)
    assert got[(cid, "cpu_usage_percpu_jiffies_total", None, None, "0")][1] == 1111.0
    assert got[(cid, "cpu_usage_percpu_jiffies_total", None, None, "1")][1] == 2222.0
    assert (cid, "cpu_usage_percpu_jiffies_total", None, None, "2") not in got

    # precpu: same derivation, prefix differs; online_cpus=0 -> no percpu
    assert got[(cid, "precpu_usage_total_jiffies_total", None, None, None)][1] == 1.0
    assert got[(cid, "precpu_online_cpus", None, None, None)][1] == 0.0
    assert not any(k[1] == "precpu_usage_percpu_jiffies_total" for k in got)

    # memory: present fields only; ext gauges + fault counters
    assert got[(cid, "memory_used_bytes", None, None, None)][:2] == ("gauge", 40120320.0)
    assert got[(cid, "memory_max_used_bytes", None, None, None)][1] == 47177728.0
    assert got[(cid, "memory_limit_bytes", None, None, None)][1] == 9223372036854771712.0
    assert got[(cid, "memory_cache_bytes", None, None, None)][:2] == ("gauge", 21282816.0)
    assert got[(cid, "memory_rss_bytes", None, None, None)][1] == 19925004.0
    assert got[(cid, "memory_page_faults_total", None, None, None)][:2] == ("counter", 31131.0)
    assert got[(cid, "memory_total_major_faults_total", None, None, None)][:2] == ("counter", 3.0)
    assert got[(cid, "memory_hierarchical_memory_limit_bytes", None, None, None)][1] == 536870912.0
    assert (cid, "memory_dirty_bytes", None, None, None) not in got  # absent

    # network: per-interface counters, device=interface
    assert got[(cid, "network_receive_bytes_total", "eth1", None, None)][:2] == ("counter", 329932716.0)
    assert got[(cid, "network_transmit_packets_total", "eth1", None, None)][1] == 29201.0


def test_ecs_multi_container_and_empty_sections(spark):
    doc = json.dumps({
        "aaa": {"read": "2026-01-01T00:00:00Z",
                "memory_stats": {"usage": 10}},
        "bbb": {"read": "2026-01-01T00:00:01Z", "name": "b",
                "cpu_stats": {"system_cpu_usage": 7}},
    })
    got = _rows(spark, doc)
    assert got[("aaa", "memory_used_bytes", None, None, None)][:2] == ("gauge", 10.0)
    assert got[("aaa", "memory_used_bytes", None, None, None)][3] is None
    assert got[("bbb", "cpu_usage_system_jiffies_total", None, None, None)][:2] == ("counter", 7.0)
    assert len(got) == 2  # nothing else present -> nothing else emitted


def test_ecs_invalid_and_empty(spark):
    df = spark.createDataFrame([("not json",), ("{}",), (None,)], "body string")
    out = df.select(F.size(parse_ecs_metrics(F.col("body"))).alias("n")).collect()
    assert [r["n"] for r in out] == [0, 0, 0]
