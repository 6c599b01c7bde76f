"""codec_mongodb_status contract fixture + oracle generator.

One emission table — my independent transcription of the reference's
serverStatus metric derivation (mongodb_metrics/mod.rs:274-970) — drives
BOTH sides of the contract: the Spark-side synthetic document builder
(nested struct -> to_json, gated leaves nulled so ignoreNullFields drops
them) and the DuckDB oracle (a VALUES table of expected rows joined onto
events with the same gating WHEREs). Every unique JSON leaf gets a
distinct constant (1000+i; *1000+500 for the millis leaves so the i64
truncation divide is exercised with a nonzero dropped remainder), so a
crossed-wire mapping in the parser can't cancel out.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, functions as F

# gates: name -> SQL predicate over events (Spark mirrors via F.expr)
GATES = {
    "base": "TRUE",
    "wt": "event_id % 3 <> 2",
    "heap": "event_id % 2 = 0",
    "mapped": "event_id % 2 = 0",
    "mwj": "event_id % 7 = 0",
    "dbw": "event_id % 2 = 1",
    "rec": "event_id % 4 = 0",
    "cscan": "event_id % 4 <> 1",
    "wlat": "event_id % 5 = 0",
}

# (emission name, mtype, {tag: value}, json path ('/'-separated), gate)
# paths under wiredTiger implicitly carry the 'wt' gate on top.
EMISSIONS = [
    ("asserts_total", "counter", {"type": "regular"}, "asserts/regular", "base"),
    ("asserts_total", "counter", {"type": "warning"}, "asserts/warning", "base"),
    ("asserts_total", "counter", {"type": "msg"}, "asserts/msg", "base"),
    ("asserts_total", "counter", {"type": "user"}, "asserts/user", "base"),
    ("asserts_total", "counter", {"type": "rollovers"}, "asserts/rollovers", "base"),
    ("connections", "counter", {"state": "active"}, "connections/active", "base"),
    ("connections", "counter", {"state": "available"}, "connections/available", "base"),
    ("connections", "counter", {"state": "current"}, "connections/current", "base"),
    ("extra_info_heap_usage_bytes", "gauge", {}, "extra_info/heap_usage_bytes", "heap"),
    ("extra_info_page_faults", "gauge", {}, "extra_info/page_faults", "base"),
    ("instance_uptime_estimate_seconds_total", "gauge", {}, "uptimeEstimate", "base"),
    ("memory", "gauge", {"type": "resident"}, "mem/resident", "base"),
    ("memory", "gauge", {"type": "virtual"}, "mem/virtual", "base"),
    ("memory", "gauge", {"type": "mapped"}, "mem/mapped", "mapped"),
    ("memory", "gauge", {"type": "mapped_with_journal"}, "mem/mappedWithJournal", "mwj"),
    ("mongod_global_lock_total_time_seconds", "counter", {}, "globalLock/totalTime", "base"),
    ("mongod_global_lock_active_clients", "gauge", {"type": "total"}, "globalLock/activeClients/total", "base"),
    ("mongod_global_lock_active_clients", "gauge", {"type": "readers"}, "globalLock/activeClients/readers", "base"),
    ("mongod_global_lock_active_clients", "gauge", {"type": "writers"}, "globalLock/activeClients/writers", "base"),
    ("mongod_global_lock_current_queue", "gauge", {"type": "total"}, "globalLock/currentQueue/total", "base"),
    ("mongod_global_lock_current_queue", "gauge", {"type": "readers"}, "globalLock/currentQueue/readers", "base"),
    ("mongod_global_lock_current_queue", "gauge", {"type": "writers"}, "globalLock/currentQueue/writers", "base"),
    ("mongod_metrics_cursor_timed_out_total", "counter", {}, "metrics/cursor/timedOut", "base"),
    ("mongod_metrics_cursor_open", "gauge", {"state": "no_timeout"}, "metrics/cursor/open/noTimeout", "base"),
    ("mongod_metrics_cursor_open", "gauge", {"state": "pinned"}, "metrics/cursor/open/pinned", "base"),
    ("mongod_metrics_cursor_open", "gauge", {"state": "total"}, "metrics/cursor/open/total", "base"),
    ("mongod_metrics_document_total", "counter", {"state": "deleted"}, "metrics/document/deleted", "base"),
    ("mongod_metrics_document_total", "counter", {"state": "inserted"}, "metrics/document/inserted", "base"),
    ("mongod_metrics_document_total", "counter", {"state": "returned"}, "metrics/document/returned", "base"),
    ("mongod_metrics_document_total", "counter", {"state": "updated"}, "metrics/document/updated", "base"),
    ("mongod_metrics_get_last_error_wtime_num", "gauge", {}, "metrics/getLastError/wtime/num", "base"),
    ("mongod_metrics_get_last_error_wtime_seconds_total", "counter", {}, "metrics/getLastError/wtime/totalMillis", "base"),
    ("mongod_metrics_get_last_error_wtimeouts_total", "counter", {}, "metrics/getLastError/wtimeouts", "base"),
    ("mongod_metrics_operation_total", "counter", {"type": "scan_and_order"}, "metrics/operation/scanAndOrder", "base"),
    ("mongod_metrics_operation_total", "counter", {"type": "write_conflicts"}, "metrics/operation/writeConflicts", "base"),
    ("mongod_metrics_query_executor_total", "counter", {"state": "scanned"}, "metrics/queryExecutor/scanned", "base"),
    ("mongod_metrics_query_executor_total", "counter", {"state": "scanned_objects"}, "metrics/queryExecutor/scannedObjects", "base"),
    ("mongod_metrics_query_executor_total", "counter", {"state": "collection_scans"}, "metrics/queryExecutor/collectionScans/total", "cscan"),
    ("mongod_metrics_record_moves_total", "counter", {}, "metrics/record/moves", "rec"),
    ("mongod_metrics_repl_apply_batches_num_total", "counter", {}, "metrics/repl/apply/batches/num", "base"),
    ("mongod_metrics_repl_apply_batches_seconds_total", "counter", {}, "metrics/repl/apply/batches/totalMillis", "base"),
    ("mongod_metrics_repl_apply_ops_total", "counter", {}, "metrics/repl/apply/ops", "base"),
    ("mongod_metrics_repl_buffer_count", "counter", {}, "metrics/repl/buffer/count", "base"),
    ("mongod_metrics_repl_buffer_max_size_bytes_total", "counter", {}, "metrics/repl/buffer/maxSizeBytes", "base"),
    ("mongod_metrics_repl_buffer_size_bytes", "counter", {}, "metrics/repl/buffer/sizeBytes", "base"),
    ("mongod_metrics_repl_executor_queue", "gauge", {"type": "network_in_progress"}, "metrics/repl/executor/queues/networkInProgress", "base"),
    ("mongod_metrics_repl_executor_queue", "gauge", {"type": "sleepers"}, "metrics/repl/executor/queues/sleepers", "base"),
    ("mongod_metrics_repl_executor_unsignaled_events", "gauge", {}, "metrics/repl/executor/unsignaledEvents", "base"),
    ("mongod_metrics_repl_network_bytes_total", "counter", {}, "metrics/repl/network/bytes", "base"),
    ("mongod_metrics_repl_network_getmores_num_total", "counter", {}, "metrics/repl/network/getmores/num", "base"),
    ("mongod_metrics_repl_network_getmores_seconds_total", "counter", {}, "metrics/repl/network/getmores/totalMillis", "base"),
    ("mongod_metrics_repl_network_ops_total", "counter", {}, "metrics/repl/network/ops", "base"),
    ("mongod_metrics_repl_network_readers_created_total", "counter", {}, "metrics/repl/network/readersCreated", "base"),
    ("mongod_metrics_ttl_deleted_documents_total", "counter", {}, "metrics/ttl/deletedDocuments", "base"),
    ("mongod_metrics_ttl_passes_total", "counter", {}, "metrics/ttl/passes", "base"),
    ("network_bytes_total", "counter", {"state": "bytes_in"}, "network/bytesIn", "base"),
    ("network_bytes_total", "counter", {"state": "bytes_out"}, "network/bytesOut", "base"),
    ("network_metrics_num_requests_total", "counter", {}, "network/numRequests", "base"),
    # wiredTiger (gate wt); note pages read/written emit TWICE each
    ("mongod_wiredtiger_blockmanager_blocks_total", "counter", {"type": "blocks_read"}, "wiredTiger/block-manager/blocks read", "wt"),
    ("mongod_wiredtiger_blockmanager_blocks_total", "counter", {"type": "blocks_read_mapped"}, "wiredTiger/block-manager/mapped blocks read", "wt"),
    ("mongod_wiredtiger_blockmanager_blocks_total", "counter", {"type": "blocks_pre_loaded"}, "wiredTiger/block-manager/blocks pre-loaded", "wt"),
    ("mongod_wiredtiger_blockmanager_blocks_total", "counter", {"type": "blocks_written"}, "wiredTiger/block-manager/blocks written", "wt"),
    ("mongod_wiredtiger_blockmanager_bytes_total", "counter", {"type": "bytes_read"}, "wiredTiger/block-manager/bytes read", "wt"),
    ("mongod_wiredtiger_blockmanager_bytes_total", "counter", {"type": "bytes_read_mapped"}, "wiredTiger/block-manager/mapped bytes read", "wt"),
    ("mongod_wiredtiger_blockmanager_bytes_total", "counter", {"type": "bytes_written"}, "wiredTiger/block-manager/bytes written", "wt"),
    ("mongod_wiredtiger_cache_bytes", "gauge", {"type": "total"}, "wiredTiger/cache/bytes currently in the cache", "wt"),
    ("mongod_wiredtiger_cache_bytes", "gauge", {"type": "dirty"}, "wiredTiger/cache/tracked dirty bytes in the cache", "wt"),
    ("mongod_wiredtiger_cache_bytes", "gauge", {"type": "internal_pages"}, "wiredTiger/cache/tracked bytes belonging to internal pages in the cache", "wt"),
    ("mongod_wiredtiger_cache_bytes", "gauge", {"type": "leaf_pages"}, "wiredTiger/cache/tracked bytes belonging to leaf pages in the cache", "wt"),
    ("mongod_wiredtiger_cache_bytes_total", "counter", {"type": "read"}, "wiredTiger/cache/pages read into cache", "wt"),
    ("mongod_wiredtiger_cache_bytes_total", "counter", {"type": "written"}, "wiredTiger/cache/pages written from cache", "wt"),
    ("mongod_wiredtiger_cache_evicted_total", "counter", {"type": "modified"}, "wiredTiger/cache/modified pages evicted", "wt"),
    ("mongod_wiredtiger_cache_evicted_total", "counter", {"type": "unmodified"}, "wiredTiger/cache/unmodified pages evicted", "wt"),
    ("mongod_wiredtiger_cache_max_bytes", "gauge", {}, "wiredTiger/cache/maximum bytes configured", "wt"),
    ("mongod_wiredtiger_cache_overhead_percent", "gauge", {}, "wiredTiger/cache/percentage overhead", "wt"),
    ("mongod_wiredtiger_cache_pages", "gauge", {"type": "total"}, "wiredTiger/cache/pages currently held in the cache", "wt"),
    ("mongod_wiredtiger_cache_pages", "gauge", {"type": "dirty"}, "wiredTiger/cache/tracked dirty pages in the cache", "wt"),
    ("mongod_wiredtiger_cache_pages_total", "counter", {"type": "read"}, "wiredTiger/cache/pages read into cache", "wt"),
    ("mongod_wiredtiger_cache_pages_total", "counter", {"type": "write"}, "wiredTiger/cache/pages written from cache", "wt"),
    ("mongod_wiredtiger_concurrent_transactions_available_tickets", "gauge", {"type": "read"}, "wiredTiger/concurrentTransactions/read/available", "wt"),
    ("mongod_wiredtiger_concurrent_transactions_available_tickets", "gauge", {"type": "write"}, "wiredTiger/concurrentTransactions/write/available", "wt"),
    ("mongod_wiredtiger_concurrent_transactions_out_tickets", "gauge", {"type": "read"}, "wiredTiger/concurrentTransactions/read/out", "wt"),
    ("mongod_wiredtiger_concurrent_transactions_out_tickets", "gauge", {"type": "write"}, "wiredTiger/concurrentTransactions/write/out", "wt"),
    ("mongod_wiredtiger_concurrent_transactions_total_tickets", "gauge", {"type": "read"}, "wiredTiger/concurrentTransactions/read/totalTickets", "wt"),
    ("mongod_wiredtiger_concurrent_transactions_total_tickets", "gauge", {"type": "write"}, "wiredTiger/concurrentTransactions/write/totalTickets", "wt"),
    ("mongod_wiredtiger_log_bytes_total", "counter", {"type": "payload"}, "wiredTiger/log/log bytes of payload data", "wt"),
    ("mongod_wiredtiger_log_bytes_total", "counter", {"type": "written"}, "wiredTiger/log/log bytes written", "wt"),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "write"}, "wiredTiger/log/log write operations", "wt"),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "scan"}, "wiredTiger/log/log scan operations", "wt"),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "scan_double"}, "wiredTiger/log/log scan records requiring two reads", "wt"),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "sync"}, "wiredTiger/log/log sync operations", "wt"),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "sync_dir"}, "wiredTiger/log/log sync_dir operations", "wt"),
    ("mongod_wiredtiger_log_operations_total", "counter", {"type": "flush"}, "wiredTiger/log/log flush operations", "wt"),
    ("mongod_wiredtiger_log_records_scanned_total", "counter", {"type": "compressed"}, "wiredTiger/log/log records compressed", "wt"),
    ("mongod_wiredtiger_log_records_scanned_total", "counter", {"type": "uncompressed"}, "wiredTiger/log/log records not compressed", "wt"),
    ("mongod_wiredtiger_log_records_total", "counter", {}, "wiredTiger/log/records processed by log scan", "wt"),
    ("mongod_wiredtiger_session_open_sessions", "gauge", {}, "wiredTiger/session/open session count", "wt"),
    ("mongod_wiredtiger_transactions_checkpoint_seconds", "gauge", {"type": "min"}, "wiredTiger/transaction/transaction checkpoint min time (msecs)", "wt"),
    ("mongod_wiredtiger_transactions_checkpoint_seconds", "gauge", {"type": "max"}, "wiredTiger/transaction/transaction checkpoint max time (msecs)", "wt"),
    ("mongod_wiredtiger_transactions_checkpoint_seconds_total", "counter", {}, "wiredTiger/transaction/transaction checkpoint total time (msecs)", "wt"),
    ("mongod_wiredtiger_transactions_running_checkpoints", "gauge", {}, "wiredTiger/transaction/transaction checkpoint currently running", "wt"),
    ("mongod_wiredtiger_transactions_total", "counter", {"type": "begins"}, "wiredTiger/transaction/transaction begins", "wt"),
    ("mongod_wiredtiger_transactions_total", "counter", {"type": "checkpoints"}, "wiredTiger/transaction/transaction checkpoints", "wt"),
    ("mongod_wiredtiger_transactions_total", "counter", {"type": "committed"}, "wiredTiger/transaction/transactions committed", "wt"),
    ("mongod_wiredtiger_transactions_total", "counter", {"type": "rolledback"}, "wiredTiger/transaction/transactions rolled back", "wt"),
]

# json leaves whose value is MILLISECONDS divided (i64-truncated) by 1000
# at emission time — given constant c their doc value is c*1000+500
_MILLIS_PATHS = {
    "metrics/getLastError/wtime/totalMillis",
    "metrics/repl/apply/batches/totalMillis",
    "metrics/repl/network/getmores/totalMillis",
    "wiredTiger/transaction/transaction checkpoint min time (msecs)",
    "wiredTiger/transaction/transaction checkpoint max time (msecs)",
    "wiredTiger/transaction/transaction checkpoint total time (msecs)",
}

# map-section constants (locks / opLatencies / opcounters)
LOCK_GLOBAL_R, LOCK_GLOBAL_W, LOCK_DB_W = 7111, 7222, 7333
LAT_READS, LAT_READS_OPS = 7444, 7555
LAT_READS_H1, LAT_READS_H2 = 7666, 7777  # histogram counts at micros 1, 2
LAT_WRITES, LAT_WRITES_OPS = 7888, 7999
OPC_INSERT, OPC_QUERY, OPCR_COMMAND = 8111, 8222, 8333


def _path_values() -> dict:
    """unique path -> constant doc value (millis paths scaled)."""
    out: dict = {}
    i = 0
    for _n, _m, _t, path, _g in EMISSIONS:
        if path in out:
            continue
        c = 1000 + i
        i += 1
        out[path] = c * 1000 + 500 if path in _MILLIS_PATHS else c
    return out


def _emitted_value(path: str) -> int:
    v = _path_values()[path]
    return v // 1000 if path in _MILLIS_PATHS else v


def build_doc(ts_col: Column, eid: Column) -> Column:
    """Synthetic serverStatus JSON per event: constants from the emission
    table, presence controlled by GATES (gated leaves nulled so to_json
    drops them), localTime/uptime event-varying."""
    vals = _path_values()
    gate_col = {g: F.expr(sql) for g, sql in GATES.items()}

    tree: dict = {}
    for path, v in vals.items():
        parts = path.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        gates = {g for n, m, t, pp, g in EMISSIONS if pp == path}
        gate = next(iter(gates))
        lit = F.lit(v).cast("long")
        if path == "wiredTiger/cache/maximum bytes configured":
            lit = F.lit(float(v))
        d[parts[-1]] = (lit if gate in ("base", "wt")
                        else F.when(gate_col[gate], lit))

    def to_struct(d):
        return F.struct(*[
            (to_struct(v) if isinstance(v, dict) else v).alias(k)
            for k, v in d.items()
        ])

    wt = to_struct(tree.pop("wiredTiger"))
    extras = [
        ((eid % 89).cast("double") + F.lit(0.5)).alias("uptime"),
        F.date_format(ts_col, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("localTime"),
        F.struct(F.lit("wiredTiger").alias("name")).alias("storageEngine"),
        F.when(gate_col["wt"], wt).alias("wiredTiger"),
        _locks_col(gate_col["dbw"]).alias("locks"),
        _latencies_col(gate_col["wlat"]).alias("opLatencies"),
        F.create_map(F.lit("insert"), F.lit(OPC_INSERT).cast("long"),
                     F.lit("query"), F.lit(OPC_QUERY).cast("long")).alias("opcounters"),
        F.create_map(F.lit("command"), F.lit(OPCR_COMMAND).cast("long")).alias("opcountersRepl"),
    ]
    top = [to_struct(v).alias(k) if isinstance(v, dict) else v.alias(k)
           for k, v in tree.items()]
    return F.to_json(F.struct(*top, *extras))


def _locks_col(dbw: Column) -> Column:
    glob = F.struct(F.struct(
        F.lit(LOCK_GLOBAL_R).cast("long").alias("r"),
        F.lit(LOCK_GLOBAL_W).cast("long").alias("w"),
    ).alias("timeAcquiringMicros"))
    db = F.struct(F.struct(
        F.lit(None).cast("long").alias("r"),
        F.lit(LOCK_DB_W).cast("long").alias("w"),
    ).alias("timeAcquiringMicros"))
    both = F.create_map(F.lit("Global"), glob, F.lit("Database"), db)
    only = F.create_map(F.lit("Global"), glob)
    return F.when(dbw, both).otherwise(only)


def _latencies_col(wlat: Column) -> Column:
    def stat(lat, ops, hist):
        return F.struct(
            F.lit(lat).cast("long").alias("latency"),
            F.lit(ops).cast("long").alias("ops"),
            hist.alias("histogram"),
        )

    bucket = "array<struct<micros:bigint,count:bigint>>"
    reads = stat(LAT_READS, LAT_READS_OPS, F.array(
        F.struct(F.lit(1).cast("long").alias("micros"),
                 F.lit(LAT_READS_H1).cast("long").alias("count")),
        F.struct(F.lit(2).cast("long").alias("micros"),
                 F.lit(LAT_READS_H2).cast("long").alias("count")),
    ))
    writes = stat(LAT_WRITES, LAT_WRITES_OPS, F.array().cast(bucket))
    both = F.create_map(F.lit("reads"), reads, F.lit("writes"), writes)
    only = F.create_map(F.lit("reads"), reads)
    return F.when(wlat, both).otherwise(only)


def _sql_tag(v):
    return f"'{v}'" if v is not None else "NULL"


def oracle_sql() -> str:
    """Expected rows as events x VALUES with the table's gating WHEREs."""
    rows = []
    for name, mtype, tags, path, gate in EMISSIONS:
        rows.append((name, mtype, tags.get("type"), tags.get("state"),
                     tags.get("mode"), tags.get("micros"), None,
                     float(_emitted_value(path)), gate))
    rows += [
        ("mongod_locks_time_acquiring_global_seconds_total", "counter",
         "Global", None, "read", None, None, float(LOCK_GLOBAL_R), "base"),
        ("mongod_locks_time_acquiring_global_seconds_total", "counter",
         "Global", None, "write", None, None, float(LOCK_GLOBAL_W), "base"),
        ("mongod_locks_time_acquiring_global_seconds_total", "counter",
         "Database", None, "write", None, None, float(LOCK_DB_W), "dbw"),
        ("mongod_op_latencies_histogram", "gauge", "reads", None, None,
         "1", None, float(LAT_READS_H1), "base"),
        ("mongod_op_latencies_histogram", "gauge", "reads", None, None,
         "2", None, float(LAT_READS_H2), "base"),
        ("mongod_op_latencies_latency", "gauge", "reads", None, None,
         None, None, float(LAT_READS), "base"),
        ("mongod_op_latencies_ops_total", "gauge", "reads", None, None,
         None, None, float(LAT_READS_OPS), "base"),
        ("mongod_op_latencies_latency", "gauge", "writes", None, None,
         None, None, float(LAT_WRITES), "wlat"),
        ("mongod_op_latencies_ops_total", "gauge", "writes", None, None,
         None, None, float(LAT_WRITES_OPS), "wlat"),
        # the reference's opcounters swap, as written (mod.rs:953-968)
        ("op_counters_repl_total", "counter", "insert", None, None, None,
         None, float(OPC_INSERT), "base"),
        ("op_counters_repl_total", "counter", "query", None, None, None,
         None, float(OPC_QUERY), "base"),
        ("op_counters_total", "counter", "command", None, None, None,
         None, float(OPCR_COMMAND), "base"),
        ("mongod_storage_engine", "gauge", None, None, None, None,
         "wiredTiger", 1.0, "base"),
    ]
    values = ",\n  ".join(
        f"({_sql_tag(n)}, {_sql_tag(m)}, {_sql_tag(t)}, {_sql_tag(s)},"
        f" {_sql_tag(mo)}, {_sql_tag(mi)}, {_sql_tag(en)}, {val}, {_sql_tag(g)})"
        for n, m, t, s, mo, mi, en, val, g in rows
    )
    gate_cases = " ".join(
        f"WHEN '{g}' THEN ({sql})" for g, sql in GATES.items()
    )
    return f"""
WITH v(name, mtype, type, state, mode, micros, engine, value, grp) AS (
  VALUES
  {values}
)
SELECT e.event_id, v.name, v.mtype, CAST(v.value AS DOUBLE) AS value,
       v.type, v.state, v.mode, v.micros, v.engine
FROM events e CROSS JOIN v
WHERE CASE v.grp {gate_cases} ELSE FALSE END
UNION ALL
SELECT event_id, 'instance_uptime_seconds_total', 'gauge',
       CAST(event_id % 89 AS DOUBLE) + 0.5, NULL, NULL, NULL, NULL, NULL
FROM events
UNION ALL
SELECT event_id, 'instance_local_time', 'gauge',
       CAST(epoch_us(ts) // 1000000 AS DOUBLE), NULL, NULL, NULL, NULL, NULL
FROM events
"""
