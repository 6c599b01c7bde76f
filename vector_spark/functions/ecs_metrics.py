"""AWS ECS task-metadata `/stats` document -> metric rows.

Spark-first re-expression of the reference's aws_ecs_metrics source
(src/sources/aws_ecs_metrics/mod.rs config surface, parser.rs:1-560
metric derivation): the endpoint returns ONE JSON object mapping
container-id -> docker ContainerStats; every present field becomes one
Absolute metric (counter or gauge value type) named `<prefix>_<name>`,
tagged container_id/container_name plus blkio `device`("major:minor") +
`op`(lowercased), percpu `cpu`(index), network `device`(interface).
Scales mirror parser.rs: io_service_time & io_wait_time & throttled_time
ns->s (/1e9), io_time ms->s (/1e3); everything else raw.

Plan shape: one `from_json` against a full typed schema (the serde
struct mirror), then a single expression fold that concatenates
per-section metric arrays — zero Python in the row path, one explode at
the caller. At 100 TB (a fleet of scraped stats documents) the parse is
scan-parallel and emits ~40-80 narrow rows per container; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLKIO_ARR = "array<struct<major:bigint,minor:bigint,op:string,value:double>>"
_CPU_STRUCT = (
    "struct<cpu_usage:struct<total_usage:double,percpu_usage:array<double>,"
    "usage_in_usermode:double,usage_in_kernelmode:double>,"
    "system_cpu_usage:double,online_cpus:bigint,"
    "throttling_data:struct<periods:double,throttled_periods:double,"
    "throttled_time:double>>"
)
_MEM_EXT_FIELDS = (
    "active_anon active_file cache dirty inactive_anon inactive_file "
    "mapped_file pgfault pgmajfault pgpgin pgpgout rss rss_huge "
    "unevictable writeback total_active_anon total_active_file total_cache "
    "total_dirty total_inactive_anon total_inactive_file total_mapped_file "
    "total_pgfault total_pgmajfault total_pgpgin total_pgpgout total_rss "
    "total_rss_huge total_unevictable total_writeback "
    "hierarchical_memory_limit hierarchical_memsw_limit"
).split()

ECS_STATS_SCHEMA = (
    "map<string, struct<"
    "read:string, name:string,"
    "blkio_stats:struct<"
    + ",".join(
        f"{k}:{_BLKIO_ARR}"
        for k in (
            "io_merged_recursive io_queue_recursive io_service_bytes_recursive "
            "io_service_time_recursive io_serviced_recursive io_time_recursive "
            "io_wait_time_recursive sectors_recursive"
        ).split()
    )
    + ">,"
    f"cpu_stats:{_CPU_STRUCT}, precpu_stats:{_CPU_STRUCT},"
    "memory_stats:struct<usage:double,max_usage:double,limit:double,"
    "stats:struct<" + ",".join(f"{k}:double" for k in _MEM_EXT_FIELDS) + ">>,"
    "networks:map<string,struct<rx_bytes:double,rx_packets:double,"
    "rx_errors:double,rx_dropped:double,tx_bytes:double,tx_packets:double,"
    "tx_errors:double,tx_dropped:double>>"
    ">>"
)

ECS_METRIC_SCHEMA = (
    "array<struct<container_id:string, container_name:string, ts_us:bigint,"
    " name:string, mtype:string, value:double,"
    " device:string, op:string, cpu:string>>"
)

# (blkio field, metric name, ns->unit divisor or None) — parser.rs:165-250
_BLKIO_METRICS = [
    ("io_merged_recursive", "recursive_io_merged_total", None),
    ("io_queue_recursive", "recursive_io_queued_total", None),
    ("io_service_bytes_recursive", "recursive_io_service_bytes_total", None),
    ("io_service_time_recursive", "recursive_io_service_time_seconds_total",
     1_000_000_000.0),
    ("io_serviced_recursive", "recursive_io_serviced_total", None),
    ("io_time_recursive", "recursive_io_time_seconds_total", 1_000.0),
    ("io_wait_time_recursive", "recursive_io_wait_time_seconds_total",
     1_000_000_000.0),
    ("sectors_recursive", "recursive_sectors_total", None),
]

# memory ext field -> (metric name, counter?) — parser.rs:396-470
_MEM_EXT_METRICS = [
    ("active_anon", "active_anonymous_bytes", False),
    ("active_file", "active_file_bytes", False),
    ("cache", "cache_bytes", False),
    ("dirty", "dirty_bytes", False),
    ("inactive_anon", "inactive_anonymous_bytes", False),
    ("inactive_file", "inactive_file_bytes", False),
    ("mapped_file", "mapped_file_bytes", False),
    ("rss", "rss_bytes", False),
    ("rss_huge", "rss_hugepages_bytes", False),
    ("unevictable", "unevictable_bytes", False),
    ("writeback", "writeback_bytes", False),
    ("total_active_anon", "total_active_anonymous_bytes", False),
    ("total_active_file", "total_active_file_bytes", False),
    ("total_cache", "total_cache_bytes", False),
    ("total_dirty", "total_dirty_bytes", False),
    ("total_inactive_anon", "total_inactive_anonymous_bytes", False),
    ("total_inactive_file", "total_inactive_file_bytes", False),
    ("total_mapped_file", "total_mapped_file_bytes", False),
    ("total_rss", "total_rss_bytes", False),
    ("total_rss_huge", "total_rss_hugepages_bytes", False),
    ("total_unevictable", "total_unevictable_bytes", False),
    ("total_writeback", "total_writeback_bytes", False),
    ("hierarchical_memory_limit", "hierarchical_memory_limit_bytes", False),
    ("hierarchical_memsw_limit", "hierarchical_memsw_limit_bytes", False),
    ("pgfault", "page_faults_total", True),
    ("pgmajfault", "major_faults_total", True),
    ("pgpgin", "page_charged_total", True),
    ("pgpgout", "page_uncharged_total", True),
    ("total_pgfault", "total_page_faults_total", True),
    ("total_pgmajfault", "total_major_faults_total", True),
    ("total_pgpgin", "total_page_charged_total", True),
    ("total_pgpgout", "total_page_uncharged_total", True),
]

# network field -> metric name — parser.rs:478-500
_NET_METRICS = [
    ("rx_bytes", "receive_bytes_total"),
    ("rx_packets", "receive_packets_total"),
    ("rx_dropped", "receive_packets_drop_total"),
    ("rx_errors", "receive_errs_total"),
    ("tx_bytes", "transmit_bytes_total"),
    ("tx_packets", "transmit_packets_total"),
    ("tx_dropped", "transmit_packets_drop_total"),
    ("tx_errors", "transmit_errs_total"),
]


def parse_ecs_metrics(col: Column) -> Column:
    """One ECS task-metadata stats document (JSON string) ->
    ECS_METRIC_SCHEMA array, every present field of every container as
    one metric row. Namespace is the source CONFIG's concern
    (default "awsecs", mod.rs:124-126) — attach it at the caller."""
    parsed = F.from_json(col, ECS_STATS_SCHEMA)
    empty = F.array().cast(ECS_METRIC_SCHEMA)
    null_s = F.lit(None).cast("string")

    def rows_for(cid, cname, ts_us, c):
        def mk(name, mtype, value, device=null_s, op=null_s, cpu=null_s):
            return F.struct(
                cid.alias("container_id"), cname.alias("container_name"),
                ts_us.alias("ts_us"), name.alias("name"),
                F.lit(mtype).alias("mtype"), value.alias("value"),
                device.alias("device"), op.alias("op"), cpu.alias("cpu"),
            )

        def opt(name, mtype, value, **tags):
            one = F.array(mk(F.lit(name), mtype, value, **tags))
            return F.when(value.isNotNull(), one).otherwise(empty)

        parts = []
        # blkio: one counter per array entry, device="major:minor", op lower
        blk = c["blkio_stats"]

        def blk_part(field, mname, div):
            # factory closure: a unary callback (a 2-arg lambda would make
            # F.transform bind the INDEX to the second parameter)
            def body(e):
                val = (e["value"] / div) if div else e["value"]
                return mk(
                    F.lit(f"blkio_{mname}"), "counter", val,
                    device=F.concat(e["major"].cast("string"), F.lit(":"),
                                    e["minor"].cast("string")),
                    op=F.lower(e["op"]),
                )
            return F.transform(
                F.coalesce(blk[field], F.array().cast(_BLKIO_ARR)), body
            )

        for field, mname, div in _BLKIO_METRICS:
            parts.append(blk_part(field, mname, div))
        # cpu + precpu share the derivation, prefix differs (parser.rs:255)
        for prefix in ("cpu", "precpu"):
            s = c[f"{prefix}_stats"]
            u = s["cpu_usage"]
            parts += [
                opt(f"{prefix}_online_cpus", "gauge",
                    s["online_cpus"].cast("double")),
                opt(f"{prefix}_usage_system_jiffies_total", "counter",
                    s["system_cpu_usage"]),
                opt(f"{prefix}_usage_usermode_jiffies_total", "counter",
                    u["usage_in_usermode"]),
                opt(f"{prefix}_usage_kernelmode_jiffies_total", "counter",
                    u["usage_in_kernelmode"]),
                opt(f"{prefix}_usage_total_jiffies_total", "counter",
                    u["total_usage"]),
                opt(f"{prefix}_throttling_periods_total", "counter",
                    s["throttling_data"]["periods"]),
                opt(f"{prefix}_throttled_periods_total", "counter",
                    s["throttling_data"]["throttled_periods"]),
                opt(f"{prefix}_throttled_time_seconds_total", "counter",
                    s["throttling_data"]["throttled_time"] / 1_000_000_000.0),
            ]
            # percpu: index 0..online_cpus-1, skipping indexes past the
            # array's end (parser.rs:343-361 `percpu_usage.get(index)`).
            # The loop bound is clamped to the array size — identical
            # emissions (.get past the end yields nothing anyway), and a
            # corrupt document with online_cpus=10^9 can't explode the
            # generated sequence.
            n_cpu = F.least(s["online_cpus"],
                            F.size(u["percpu_usage"]).cast("bigint"))
            percpu = F.when(
                u["percpu_usage"].isNotNull() & (n_cpu >= 1),
                F.filter(
                    F.transform(
                        F.sequence(F.lit(0), (n_cpu - 1).cast("int")),
                        lambda i: mk(
                            F.lit(f"{prefix}_usage_percpu_jiffies_total"),
                            "counter", F.get(u["percpu_usage"], i),
                            cpu=i.cast("string"),
                        ),
                    ),
                    lambda r: r["value"].isNotNull(),
                ),
            ).otherwise(empty)
            parts.append(percpu)
        # memory
        mem = c["memory_stats"]
        parts += [
            opt("memory_used_bytes", "gauge", mem["usage"]),
            opt("memory_max_used_bytes", "gauge", mem["max_usage"]),
            opt("memory_limit_bytes", "gauge", mem["limit"]),
        ]
        for field, mname, is_counter in _MEM_EXT_METRICS:
            parts.append(opt(
                f"memory_{mname}", "counter" if is_counter else "gauge",
                mem["stats"][field],
            ))
        # networks: per-interface counters, device=interface
        nets = F.flatten(F.transform(
            F.map_entries(F.coalesce(
                c["networks"],
                F.create_map().cast(
                    "map<string,struct<rx_bytes:double,rx_packets:double,"
                    "rx_errors:double,rx_dropped:double,tx_bytes:double,"
                    "tx_packets:double,tx_errors:double,tx_dropped:double>>"
                ),
            )),
            lambda kv: F.filter(
                F.array(*[
                    mk(F.lit(f"network_{mname}"), "counter",
                       kv["value"][field], device=kv["key"])
                    for field, mname in _NET_METRICS
                ]),
                lambda r: r["value"].isNotNull(),
            ),
        ))
        parts.append(nets)
        out = parts[0]
        for p in parts[1:]:
            out = F.concat(out, p)
        return out

    # per container: id = map key, ts from the RFC3339 `read` field
    # (fraction clipped to micros for an engine-portable epoch-us)
    entries = F.map_entries(parsed)
    all_rows = F.flatten(F.transform(
        entries,
        lambda kv: rows_for(
            kv["key"],
            kv["value"]["name"],
            F.unix_micros(F.to_timestamp(F.regexp_replace(
                kv["value"]["read"], r"(\.\d{6})\d+", r"$1"))),
            kv["value"],
        ),
    ))
    return F.coalesce(all_rows, empty)
