"""MongoDB `serverStatus` document -> metric rows.

Spark-first re-expression of the reference's mongodb_metrics source
FORMAT (src/sources/mongodb_metrics/mod.rs:274-970 metric derivation,
types.rs:35-422 document shape; the live-RPC transport stays out of
scope per SURVEY §2.4 — this decodes the JSON rendering of the
serverStatus command reply a fleet collector would land in a table).

Semantics mirrored exactly:
- every emission, name, kind (the reference's counter-vs-gauge choices,
  including `connections` being counters), tag keys (type/state/mode/
  micros/engine) and values;
- Rust i64 division truncation for the *_millis/1000 and
  checkpoint-ms/1000 seconds conversions (cast-to-long after divide);
- instance_local_time = epoch seconds of localTime (millis DIV 1000);
- the reference's opcounters swap, preserved as-written (mod.rs:953-968:
  the `opcounters` map feeds op_counters_repl_total and
  `opcounters_repl` feeds op_counters_total);
- serde's all-or-nothing: a document missing ANY required (non-Option)
  field yields NO metrics; a present-but-malformed wiredTiger section
  likewise fails the whole document.

Plan shape: one from_json against the full typed schema (programmatic
StructType — wiredTiger leaf names contain spaces and parens), then an
expression fold concatenating per-section metric arrays. Zero Python in
the row path; at fleet scale the parse is scan-parallel, ~120 narrow
rows per document, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields):
    return StructType([StructField(n, t, True) for n, t in fields])


_L = LongType()
_D = DoubleType()
_STR = StringType()

_GL_INNER = _s(("total", _L), ("readers", _L), ("writers", _L))
_WTIME = _s(("num", _L), ("totalMillis", _L))

_WT_SCHEMA = _s(
    ("block-manager", _s(
        ("blocks pre-loaded", _L), ("blocks read", _L),
        ("blocks written", _L), ("bytes read", _L), ("bytes written", _L),
        ("mapped blocks read", _L), ("mapped bytes read", _L),
    )),
    ("cache", _s(
        ("bytes currently in the cache", _L),
        ("maximum bytes configured", _D),
        ("modified pages evicted", _L),
        ("pages currently held in the cache", _L),
        ("pages read into cache", _L),
        ("pages written from cache", _L),
        ("percentage overhead", _L),
        ("tracked bytes belonging to internal pages in the cache", _L),
        ("tracked bytes belonging to leaf pages in the cache", _L),
        ("tracked dirty bytes in the cache", _L),
        ("tracked dirty pages in the cache", _L),
        ("unmodified pages evicted", _L),
    )),
    ("concurrentTransactions", _s(
        ("write", _s(("out", _L), ("available", _L), ("totalTickets", _L))),
        ("read", _s(("out", _L), ("available", _L), ("totalTickets", _L))),
    )),
    ("log", _s(
        ("log bytes of payload data", _L), ("log bytes written", _L),
        ("log flush operations", _L), ("log records compressed", _L),
        ("log records not compressed", _L), ("log scan operations", _L),
        ("log scan records requiring two reads", _L),
        ("log sync operations", _L), ("log sync_dir operations", _L),
        ("log write operations", _L),
        ("records processed by log scan", _L),
    )),
    ("session", _s(("open session count", _L))),
    ("transaction", _s(
        ("transaction begins", _L), ("transaction checkpoints", _L),
        ("transaction checkpoint currently running", _L),
        ("transaction checkpoint max time (msecs)", _L),
        ("transaction checkpoint min time (msecs)", _L),
        ("transaction checkpoint total time (msecs)", _L),
        ("transactions committed", _L), ("transactions rolled back", _L),
    )),
)

MONGODB_STATUS_SCHEMA = _s(
    ("uptime", _D), ("uptimeEstimate", _L), ("localTime", _STR),
    ("asserts", _s(("regular", _L), ("warning", _L), ("msg", _L),
                   ("user", _L), ("rollovers", _L))),
    ("connections", _s(("active", _L), ("available", _L), ("current", _L))),
    ("extra_info", _s(("heap_usage_bytes", _L), ("page_faults", _L))),
    ("mem", _s(("resident", _L), ("virtual", _L), ("mapped", _L),
               ("mappedWithJournal", _L))),
    ("globalLock", _s(("totalTime", _L), ("activeClients", _GL_INNER),
                      ("currentQueue", _GL_INNER))),
    ("locks", MapType(_STR, _s(
        ("timeAcquiringMicros", _s(("r", _L), ("w", _L))),
    ))),
    ("metrics", _s(
        ("cursor", _s(("timedOut", _L),
                      ("open", _s(("noTimeout", _L), ("pinned", _L),
                                  ("total", _L))))),
        ("document", _s(("deleted", _L), ("inserted", _L),
                        ("returned", _L), ("updated", _L))),
        ("getLastError", _s(("wtime", _WTIME), ("wtimeouts", _L))),
        ("operation", _s(("scanAndOrder", _L), ("writeConflicts", _L))),
        ("queryExecutor", _s(("scanned", _L), ("scannedObjects", _L),
                             ("collectionScans", _s(("total", _L))))),
        ("record", _s(("moves", _L))),
        ("repl", _s(
            ("apply", _s(("batches", _WTIME), ("ops", _L))),
            ("buffer", _s(("count", _L), ("maxSizeBytes", _L),
                          ("sizeBytes", _L))),
            ("executor", _s(
                ("queues", _s(("networkInProgress", _L), ("sleepers", _L))),
                ("unsignaledEvents", _L))),
            ("network", _s(("bytes", _L), ("getmores", _WTIME),
                           ("ops", _L), ("readersCreated", _L))),
        )),
        ("ttl", _s(("deletedDocuments", _L), ("passes", _L))),
    )),
    ("opLatencies", MapType(_STR, _s(
        ("latency", _L), ("ops", _L),
        ("histogram", ArrayType(_s(("micros", _L), ("count", _L)))),
    ))),
    ("storageEngine", _s(("name", _STR))),
    ("wiredTiger", _WT_SCHEMA),
    ("network", _s(("bytesIn", _L), ("bytesOut", _L),
                   ("numRequests", _L))),
    ("opcounters", MapType(_STR, _L)),
    ("opcountersRepl", MapType(_STR, _L)),
)

MONGODB_METRIC_SCHEMA = (
    "array<struct<name:string, mtype:string, value:double, type:string,"
    " state:string, mode:string, micros:string, engine:string>>"
)


def _div_trunc(c: Column, d: int) -> Column:
    """Rust i64 division (truncate toward zero), then double."""
    return (c / F.lit(d)).cast("long").cast("double")


# required (non-Option) leaf paths: serde fails the WHOLE document when
# any is absent (types.rs — every field not declared Option<...>)
_REQUIRED = [
    "uptime", "uptimeEstimate", "localTime",
    "asserts.regular", "asserts.warning", "asserts.msg", "asserts.user",
    "asserts.rollovers",
    "connections.active", "connections.available", "connections.current",
    "extra_info.page_faults",
    "mem.resident", "mem.virtual",
    "globalLock.totalTime",
    "globalLock.activeClients.total", "globalLock.activeClients.readers",
    "globalLock.activeClients.writers",
    "globalLock.currentQueue.total", "globalLock.currentQueue.readers",
    "globalLock.currentQueue.writers",
    "locks",
    "metrics.cursor.timedOut", "metrics.cursor.open.noTimeout",
    "metrics.cursor.open.pinned", "metrics.cursor.open.total",
    "metrics.document.deleted", "metrics.document.inserted",
    "metrics.document.returned", "metrics.document.updated",
    "metrics.getLastError.wtime.num",
    "metrics.getLastError.wtime.totalMillis",
    "metrics.getLastError.wtimeouts",
    "metrics.operation.scanAndOrder", "metrics.operation.writeConflicts",
    "metrics.queryExecutor.scanned", "metrics.queryExecutor.scannedObjects",
    "metrics.repl.apply.batches.num", "metrics.repl.apply.batches.totalMillis",
    "metrics.repl.apply.ops",
    "metrics.repl.buffer.count", "metrics.repl.buffer.maxSizeBytes",
    "metrics.repl.buffer.sizeBytes",
    "metrics.repl.executor.queues.networkInProgress",
    "metrics.repl.executor.queues.sleepers",
    "metrics.repl.executor.unsignaledEvents",
    "metrics.repl.network.bytes", "metrics.repl.network.getmores.num",
    "metrics.repl.network.getmores.totalMillis", "metrics.repl.network.ops",
    "metrics.repl.network.readersCreated",
    "metrics.ttl.deletedDocuments", "metrics.ttl.passes",
    "opLatencies",
    "storageEngine.name",
    "network.bytesIn", "network.bytesOut", "network.numRequests",
    "opcounters", "opcountersRepl",
]

# wiredTiger: Option<> at the top, but EVERY leaf inside is required —
# a present-but-malformed section fails the whole document like serde
_WT_REQUIRED = [
    ("block-manager", ["blocks pre-loaded", "blocks read", "blocks written",
                       "bytes read", "bytes written", "mapped blocks read",
                       "mapped bytes read"]),
    ("cache", [f.name for f in _WT_SCHEMA["cache"].dataType.fields]),
    ("concurrentTransactions", []),
    ("log", [f.name for f in _WT_SCHEMA["log"].dataType.fields]),
    ("session", ["open session count"]),
    ("transaction", [f.name for f in _WT_SCHEMA["transaction"].dataType.fields]),
]


def parse_mongodb_server_status(col: Column) -> Column:
    """One serverStatus JSON document -> MONGODB_METRIC_SCHEMA array
    (all Absolute; mtype records the counter/gauge value type)."""
    s = F.from_json(col, MONGODB_STATUS_SCHEMA)
    empty = F.array().cast(MONGODB_METRIC_SCHEMA)
    null_s = F.lit(None).cast("string")

    def fld(path):
        c = s
        for part in path.split("."):
            c = c[part]
        return c

    def mk(name, mtype, value, type_=None, state=None, mode=None,
           micros=None, engine=None):
        return F.struct(
            (name if isinstance(name, Column) else F.lit(name)).alias("name"),
            F.lit(mtype).alias("mtype"),
            value.alias("value"),
            (type_ if type_ is not None else null_s).alias("type"),
            (F.lit(state) if state else null_s).alias("state"),
            (F.lit(mode) if mode else null_s).alias("mode"),
            (micros if micros is not None else null_s).alias("micros"),
            (engine if engine is not None else null_s).alias("engine"),
        )

    def g(path):  # long leaf -> double
        return fld(path).cast("double")

    t = F.lit  # tag literal shorthand

    rows = [
        # asserts_total (mod.rs:295-320)
        mk("asserts_total", "counter", g("asserts.regular"), type_=t("regular")),
        mk("asserts_total", "counter", g("asserts.warning"), type_=t("warning")),
        mk("asserts_total", "counter", g("asserts.msg"), type_=t("msg")),
        mk("asserts_total", "counter", g("asserts.user"), type_=t("user")),
        mk("asserts_total", "counter", g("asserts.rollovers"), type_=t("rollovers")),
        # connections — counters in the reference (mod.rs:322-337)
        mk("connections", "counter", g("connections.active"), state="active"),
        mk("connections", "counter", g("connections.available"), state="available"),
        mk("connections", "counter", g("connections.current"), state="current"),
        # extra_info / instance
        mk("extra_info_page_faults", "gauge", g("extra_info.page_faults")),
        mk("instance_local_time", "gauge",
           _div_trunc(F.unix_millis(F.try_to_timestamp(F.regexp_replace(
               fld("localTime"), r"(\.\d{3})\d*", r"$1"))), 1000)),
        mk("instance_uptime_estimate_seconds_total", "gauge",
           g("uptimeEstimate")),
        mk("instance_uptime_seconds_total", "gauge", fld("uptime")),
        # memory
        mk("memory", "gauge", g("mem.resident"), type_=t("resident")),
        mk("memory", "gauge", g("mem.virtual"), type_=t("virtual")),
        # global lock
        mk("mongod_global_lock_total_time_seconds", "counter",
           g("globalLock.totalTime")),
        mk("mongod_global_lock_active_clients", "gauge",
           g("globalLock.activeClients.total"), type_=t("total")),
        mk("mongod_global_lock_active_clients", "gauge",
           g("globalLock.activeClients.readers"), type_=t("readers")),
        mk("mongod_global_lock_active_clients", "gauge",
           g("globalLock.activeClients.writers"), type_=t("writers")),
        mk("mongod_global_lock_current_queue", "gauge",
           g("globalLock.currentQueue.total"), type_=t("total")),
        mk("mongod_global_lock_current_queue", "gauge",
           g("globalLock.currentQueue.readers"), type_=t("readers")),
        mk("mongod_global_lock_current_queue", "gauge",
           g("globalLock.currentQueue.writers"), type_=t("writers")),
        # cursors
        mk("mongod_metrics_cursor_timed_out_total", "counter",
           g("metrics.cursor.timedOut")),
        mk("mongod_metrics_cursor_open", "gauge",
           g("metrics.cursor.open.noTimeout"), state="no_timeout"),
        mk("mongod_metrics_cursor_open", "gauge",
           g("metrics.cursor.open.pinned"), state="pinned"),
        mk("mongod_metrics_cursor_open", "gauge",
           g("metrics.cursor.open.total"), state="total"),
        # documents
        mk("mongod_metrics_document_total", "counter",
           g("metrics.document.deleted"), state="deleted"),
        mk("mongod_metrics_document_total", "counter",
           g("metrics.document.inserted"), state="inserted"),
        mk("mongod_metrics_document_total", "counter",
           g("metrics.document.returned"), state="returned"),
        mk("mongod_metrics_document_total", "counter",
           g("metrics.document.updated"), state="updated"),
        # get_last_error
        mk("mongod_metrics_get_last_error_wtime_num", "gauge",
           g("metrics.getLastError.wtime.num")),
        mk("mongod_metrics_get_last_error_wtime_seconds_total", "counter",
           _div_trunc(fld("metrics.getLastError.wtime.totalMillis"), 1000)),
        mk("mongod_metrics_get_last_error_wtimeouts_total", "counter",
           g("metrics.getLastError.wtimeouts")),
        # operations
        mk("mongod_metrics_operation_total", "counter",
           g("metrics.operation.scanAndOrder"), type_=t("scan_and_order")),
        mk("mongod_metrics_operation_total", "counter",
           g("metrics.operation.writeConflicts"), type_=t("write_conflicts")),
        # query executor
        mk("mongod_metrics_query_executor_total", "counter",
           g("metrics.queryExecutor.scanned"), state="scanned"),
        mk("mongod_metrics_query_executor_total", "counter",
           g("metrics.queryExecutor.scannedObjects"), state="scanned_objects"),
        # repl apply / buffer / executor / network / ttl
        mk("mongod_metrics_repl_apply_batches_num_total", "counter",
           g("metrics.repl.apply.batches.num")),
        mk("mongod_metrics_repl_apply_batches_seconds_total", "counter",
           _div_trunc(fld("metrics.repl.apply.batches.totalMillis"), 1000)),
        mk("mongod_metrics_repl_apply_ops_total", "counter",
           g("metrics.repl.apply.ops")),
        mk("mongod_metrics_repl_buffer_count", "counter",
           g("metrics.repl.buffer.count")),
        mk("mongod_metrics_repl_buffer_max_size_bytes_total", "counter",
           g("metrics.repl.buffer.maxSizeBytes")),
        mk("mongod_metrics_repl_buffer_size_bytes", "counter",
           g("metrics.repl.buffer.sizeBytes")),
        mk("mongod_metrics_repl_executor_queue", "gauge",
           g("metrics.repl.executor.queues.networkInProgress"),
           type_=t("network_in_progress")),
        mk("mongod_metrics_repl_executor_queue", "gauge",
           g("metrics.repl.executor.queues.sleepers"), type_=t("sleepers")),
        mk("mongod_metrics_repl_executor_unsignaled_events", "gauge",
           g("metrics.repl.executor.unsignaledEvents")),
        mk("mongod_metrics_repl_network_bytes_total", "counter",
           g("metrics.repl.network.bytes")),
        mk("mongod_metrics_repl_network_getmores_num_total", "counter",
           g("metrics.repl.network.getmores.num")),
        mk("mongod_metrics_repl_network_getmores_seconds_total", "counter",
           _div_trunc(fld("metrics.repl.network.getmores.totalMillis"), 1000)),
        mk("mongod_metrics_repl_network_ops_total", "counter",
           g("metrics.repl.network.ops")),
        mk("mongod_metrics_repl_network_readers_created_total", "counter",
           g("metrics.repl.network.readersCreated")),
        mk("mongod_metrics_ttl_deleted_documents_total", "counter",
           g("metrics.ttl.deletedDocuments")),
        mk("mongod_metrics_ttl_passes_total", "counter",
           g("metrics.ttl.passes")),
        # storage engine marker
        mk("mongod_storage_engine", "gauge", F.lit(1.0),
           engine=fld("storageEngine.name")),
        # network_*
        mk("network_bytes_total", "counter", g("network.bytesIn"),
           state="bytes_in"),
        mk("network_bytes_total", "counter", g("network.bytesOut"),
           state="bytes_out"),
        mk("network_metrics_num_requests_total", "counter",
           g("network.numRequests")),
    ]
    base = F.array(*rows)

    def opt(name, mtype, value, **tags):
        one = F.array(mk(name, mtype, value, **tags))
        return F.when(value.isNotNull(), one).otherwise(empty)

    optionals = [
        opt("extra_info_heap_usage_bytes", "gauge",
            g("extra_info.heap_usage_bytes")),
        opt("memory", "gauge", g("mem.mapped"), type_=t("mapped")),
        opt("memory", "gauge", g("mem.mappedWithJournal"),
            type_=t("mapped_with_journal")),
        opt("mongod_metrics_query_executor_total", "counter",
            g("metrics.queryExecutor.collectionScans.total"),
            state="collection_scans"),
        opt("mongod_metrics_record_moves_total", "counter",
            g("metrics.record.moves")),
    ]

    # locks map: per lock type, optional r/w time_acquiring counters
    # (values are MICROseconds in the document; emitted as-is, matching
    # counter!(value) in mod.rs:433-451)
    locks = F.flatten(F.transform(
        F.map_entries(fld("locks")),
        lambda kv: F.filter(
            F.array(
                mk("mongod_locks_time_acquiring_global_seconds_total",
                   "counter",
                   kv["value"]["timeAcquiringMicros"]["r"].cast("double"),
                   type_=kv["key"], mode="read"),
                mk("mongod_locks_time_acquiring_global_seconds_total",
                   "counter",
                   kv["value"]["timeAcquiringMicros"]["w"].cast("double"),
                   type_=kv["key"], mode="write"),
            ),
            lambda r: r["value"].isNotNull(),
        ),
    ))

    # opLatencies map: histogram buckets + latency + ops per op type
    def lat_rows(kv):
        hist = F.transform(
            F.coalesce(kv["value"]["histogram"],
                       F.array().cast("array<struct<micros:bigint,count:bigint>>")),
            lambda b: mk("mongod_op_latencies_histogram", "gauge",
                         b["count"].cast("double"), type_=kv["key"],
                         micros=b["micros"].cast("string")),
        )
        return F.concat(hist, F.array(
            mk("mongod_op_latencies_latency", "gauge",
               kv["value"]["latency"].cast("double"), type_=kv["key"]),
            mk("mongod_op_latencies_ops_total", "gauge",
               kv["value"]["ops"].cast("double"), type_=kv["key"]),
        ))

    latencies = F.flatten(F.transform(F.map_entries(fld("opLatencies")),
                                      lat_rows))

    # the reference's as-written swap (mod.rs:953-968): `opcounters` ->
    # op_counters_repl_total, `opcountersRepl` -> op_counters_total
    op_repl = F.transform(
        F.map_entries(fld("opcounters")),
        lambda kv: mk("op_counters_repl_total", "counter",
                      kv["value"].cast("double"), type_=kv["key"]),
    )
    op_total = F.transform(
        F.map_entries(fld("opcountersRepl")),
        lambda kv: mk("op_counters_total", "counter",
                      kv["value"].cast("double"), type_=kv["key"]),
    )

    # wiredTiger section (optional as a whole, all-required inside)
    wt = fld("wiredTiger")
    bm, cache, ct = wt["block-manager"], wt["cache"], wt["concurrentTransactions"]
    log, tx = wt["log"], wt["transaction"]

    def w(section, leaf):
        return section[leaf].cast("double")

    wt_rows = F.array(
        mk("mongod_wiredtiger_blockmanager_blocks_total", "counter",
           w(bm, "blocks read"), type_=t("blocks_read")),
        mk("mongod_wiredtiger_blockmanager_blocks_total", "counter",
           w(bm, "mapped blocks read"), type_=t("blocks_read_mapped")),
        mk("mongod_wiredtiger_blockmanager_blocks_total", "counter",
           w(bm, "blocks pre-loaded"), type_=t("blocks_pre_loaded")),
        mk("mongod_wiredtiger_blockmanager_blocks_total", "counter",
           w(bm, "blocks written"), type_=t("blocks_written")),
        mk("mongod_wiredtiger_blockmanager_bytes_total", "counter",
           w(bm, "bytes read"), type_=t("bytes_read")),
        mk("mongod_wiredtiger_blockmanager_bytes_total", "counter",
           w(bm, "mapped bytes read"), type_=t("bytes_read_mapped")),
        mk("mongod_wiredtiger_blockmanager_bytes_total", "counter",
           w(bm, "bytes written"), type_=t("bytes_written")),
        mk("mongod_wiredtiger_cache_bytes", "gauge",
           w(cache, "bytes currently in the cache"), type_=t("total")),
        mk("mongod_wiredtiger_cache_bytes", "gauge",
           w(cache, "tracked dirty bytes in the cache"), type_=t("dirty")),
        mk("mongod_wiredtiger_cache_bytes", "gauge",
           w(cache, "tracked bytes belonging to internal pages in the cache"),
           type_=t("internal_pages")),
        mk("mongod_wiredtiger_cache_bytes", "gauge",
           w(cache, "tracked bytes belonging to leaf pages in the cache"),
           type_=t("leaf_pages")),
        mk("mongod_wiredtiger_cache_bytes_total", "counter",
           w(cache, "pages read into cache"), type_=t("read")),
        mk("mongod_wiredtiger_cache_bytes_total", "counter",
           w(cache, "pages written from cache"), type_=t("written")),
        mk("mongod_wiredtiger_cache_evicted_total", "counter",
           w(cache, "modified pages evicted"), type_=t("modified")),
        mk("mongod_wiredtiger_cache_evicted_total", "counter",
           w(cache, "unmodified pages evicted"), type_=t("unmodified")),
        mk("mongod_wiredtiger_cache_max_bytes", "gauge",
           cache["maximum bytes configured"]),
        mk("mongod_wiredtiger_cache_overhead_percent", "gauge",
           w(cache, "percentage overhead")),
        mk("mongod_wiredtiger_cache_pages", "gauge",
           w(cache, "pages currently held in the cache"), type_=t("total")),
        mk("mongod_wiredtiger_cache_pages", "gauge",
           w(cache, "tracked dirty pages in the cache"), type_=t("dirty")),
        mk("mongod_wiredtiger_cache_pages_total", "counter",
           w(cache, "pages read into cache"), type_=t("read")),
        mk("mongod_wiredtiger_cache_pages_total", "counter",
           w(cache, "pages written from cache"), type_=t("write")),
        mk("mongod_wiredtiger_concurrent_transactions_available_tickets",
           "gauge", ct["read"]["available"].cast("double"), type_=t("read")),
        mk("mongod_wiredtiger_concurrent_transactions_available_tickets",
           "gauge", ct["write"]["available"].cast("double"), type_=t("write")),
        mk("mongod_wiredtiger_concurrent_transactions_out_tickets",
           "gauge", ct["read"]["out"].cast("double"), type_=t("read")),
        mk("mongod_wiredtiger_concurrent_transactions_out_tickets",
           "gauge", ct["write"]["out"].cast("double"), type_=t("write")),
        mk("mongod_wiredtiger_concurrent_transactions_total_tickets",
           "gauge", ct["read"]["totalTickets"].cast("double"), type_=t("read")),
        mk("mongod_wiredtiger_concurrent_transactions_total_tickets",
           "gauge", ct["write"]["totalTickets"].cast("double"), type_=t("write")),
        mk("mongod_wiredtiger_log_bytes_total", "counter",
           w(log, "log bytes of payload data"), type_=t("payload")),
        mk("mongod_wiredtiger_log_bytes_total", "counter",
           w(log, "log bytes written"), type_=t("written")),
        mk("mongod_wiredtiger_log_operations_total", "counter",
           w(log, "log write operations"), type_=t("write")),
        mk("mongod_wiredtiger_log_operations_total", "counter",
           w(log, "log scan operations"), type_=t("scan")),
        mk("mongod_wiredtiger_log_operations_total", "counter",
           w(log, "log scan records requiring two reads"),
           type_=t("scan_double")),
        mk("mongod_wiredtiger_log_operations_total", "counter",
           w(log, "log sync operations"), type_=t("sync")),
        mk("mongod_wiredtiger_log_operations_total", "counter",
           w(log, "log sync_dir operations"), type_=t("sync_dir")),
        mk("mongod_wiredtiger_log_operations_total", "counter",
           w(log, "log flush operations"), type_=t("flush")),
        mk("mongod_wiredtiger_log_records_scanned_total", "counter",
           w(log, "log records compressed"), type_=t("compressed")),
        mk("mongod_wiredtiger_log_records_scanned_total", "counter",
           w(log, "log records not compressed"), type_=t("uncompressed")),
        mk("mongod_wiredtiger_log_records_total", "counter",
           w(log, "records processed by log scan")),
        mk("mongod_wiredtiger_session_open_sessions", "gauge",
           wt["session"]["open session count"].cast("double")),
        mk("mongod_wiredtiger_transactions_checkpoint_seconds", "gauge",
           _div_trunc(tx["transaction checkpoint min time (msecs)"], 1000),
           type_=t("min")),
        mk("mongod_wiredtiger_transactions_checkpoint_seconds", "gauge",
           _div_trunc(tx["transaction checkpoint max time (msecs)"], 1000),
           type_=t("max")),
        mk("mongod_wiredtiger_transactions_checkpoint_seconds_total",
           "counter",
           _div_trunc(tx["transaction checkpoint total time (msecs)"], 1000)),
        mk("mongod_wiredtiger_transactions_running_checkpoints", "gauge",
           w(tx, "transaction checkpoint currently running")),
        mk("mongod_wiredtiger_transactions_total", "counter",
           w(tx, "transaction begins"), type_=t("begins")),
        mk("mongod_wiredtiger_transactions_total", "counter",
           w(tx, "transaction checkpoints"), type_=t("checkpoints")),
        mk("mongod_wiredtiger_transactions_total", "counter",
           w(tx, "transactions committed"), type_=t("committed")),
        mk("mongod_wiredtiger_transactions_total", "counter",
           w(tx, "transactions rolled back"), type_=t("rolledback")),
    )
    wt_leaves_ok = F.lit(True)
    for sec, leaves in _WT_REQUIRED:
        wt_leaves_ok = wt_leaves_ok & wt[sec].isNotNull()
        for leaf in leaves:
            wt_leaves_ok = wt_leaves_ok & wt[sec][leaf].isNotNull()
    wt_leaves_ok = (
        wt_leaves_ok
        & ct["read"].isNotNull() & ct["write"].isNotNull()
        & ct["read"]["out"].isNotNull() & ct["read"]["available"].isNotNull()
        & ct["read"]["totalTickets"].isNotNull()
        & ct["write"]["out"].isNotNull() & ct["write"]["available"].isNotNull()
        & ct["write"]["totalTickets"].isNotNull()
    )
    wt_part = F.when(wt.isNull(), empty).otherwise(
        F.when(wt_leaves_ok, wt_rows).otherwise(F.lit(None).cast(
            MONGODB_METRIC_SCHEMA))
    )

    required_ok = F.lit(True)
    for path in _REQUIRED:
        required_ok = required_ok & fld(path).isNotNull()
    # malformed wiredTiger (wt_part null) also fails the whole document
    required_ok = required_ok & wt_part.isNotNull()

    out = base
    for p in optionals:
        out = F.concat(out, p)
    out = F.concat(out, locks, latencies, op_repl, op_total, wt_part)
    return F.when(required_ok, out).otherwise(empty)
