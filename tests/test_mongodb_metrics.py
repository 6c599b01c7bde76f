"""mongodb serverStatus document parser (mongodb_metrics/mod.rs:274-970,
types.rs:35-422 semantics)."""

import json

from pyspark.sql import functions as F

from vector_spark.functions import parse_mongodb_server_status


def _full_doc(**over):
    doc = {
        "uptime": 37.5, "uptimeEstimate": 36,
        "localTime": "2026-01-02T03:04:05.123Z",
        "asserts": {"regular": 1, "warning": 2, "msg": 3, "user": 4,
                    "rollovers": 5},
        "connections": {"active": 7, "available": 100, "current": 9},
        "extra_info": {"heap_usage_bytes": 55555, "page_faults": 17},
        "mem": {"resident": 81, "virtual": 811, "mapped": 10},
        "globalLock": {
            "totalTime": 12345,
            "activeClients": {"total": 3, "readers": 1, "writers": 2},
            "currentQueue": {"total": 6, "readers": 4, "writers": 2},
        },
        "locks": {
            "Global": {"timeAcquiringMicros": {"r": 1000, "w": 2000}},
            "Database": {"timeAcquiringMicros": {"w": 300}},
            "Oplog": {},
        },
        "metrics": {
            "cursor": {"timedOut": 2,
                       "open": {"noTimeout": 0, "pinned": 1, "total": 4}},
            "document": {"deleted": 10, "inserted": 20, "returned": 30,
                         "updated": 40},
            "getLastError": {"wtime": {"num": 5, "totalMillis": 2500},
                             "wtimeouts": 1},
            "operation": {"scanAndOrder": 11, "writeConflicts": 12},
            "queryExecutor": {"scanned": 100, "scannedObjects": 200,
                              "collectionScans": {"total": 7}},
            "record": {"moves": 3},
            "repl": {
                "apply": {"batches": {"num": 6, "totalMillis": 1999},
                          "ops": 60},
                "buffer": {"count": 0, "maxSizeBytes": 268435456,
                           "sizeBytes": 0},
                "executor": {"queues": {"networkInProgress": 0,
                                        "sleepers": 2},
                             "unsignaledEvents": 0},
                "network": {"bytes": 800, "getmores": {"num": 8,
                                                       "totalMillis": 4001},
                            "ops": 80, "readersCreated": 2},
            },
            "ttl": {"deletedDocuments": 9, "passes": 99},
        },
        "opLatencies": {
            "reads": {"latency": 5000, "ops": 50,
                      "histogram": [{"micros": 1, "count": 10},
                                    {"micros": 2, "count": 20}]},
            "writes": {"latency": 7000, "ops": 70, "histogram": []},
        },
        "storageEngine": {"name": "wiredTiger"},
        "wiredTiger": {
            "block-manager": {
                "blocks pre-loaded": 1, "blocks read": 2,
                "blocks written": 3, "bytes read": 4, "bytes written": 5,
                "mapped blocks read": 6, "mapped bytes read": 7,
            },
            "cache": {
                "bytes currently in the cache": 100,
                "maximum bytes configured": 1e9,
                "modified pages evicted": 1,
                "pages currently held in the cache": 22,
                "pages read into cache": 33,
                "pages written from cache": 44,
                "percentage overhead": 8,
                "tracked bytes belonging to internal pages in the cache": 9,
                "tracked bytes belonging to leaf pages in the cache": 10,
                "tracked dirty bytes in the cache": 11,
                "tracked dirty pages in the cache": 12,
                "unmodified pages evicted": 13,
            },
            "concurrentTransactions": {
                "write": {"out": 0, "available": 128, "totalTickets": 128},
                "read": {"out": 1, "available": 127, "totalTickets": 128},
            },
            "log": {
                "log bytes of payload data": 1, "log bytes written": 2,
                "log flush operations": 3, "log records compressed": 4,
                "log records not compressed": 5, "log scan operations": 6,
                "log scan records requiring two reads": 7,
                "log sync operations": 8, "log sync_dir operations": 9,
                "log write operations": 10,
                "records processed by log scan": 11,
            },
            "session": {"open session count": 15},
            "transaction": {
                "transaction begins": 1, "transaction checkpoints": 2,
                "transaction checkpoint currently running": 0,
                "transaction checkpoint max time (msecs)": 4999,
                "transaction checkpoint min time (msecs)": 1500,
                "transaction checkpoint total time (msecs)": 9999,
                "transactions committed": 7, "transactions rolled back": 8,
            },
        },
        "network": {"bytesIn": 111, "bytesOut": 222, "numRequests": 333},
        "opcounters": {"insert": 1, "query": 2},
        "opcountersRepl": {"insert": 3, "command": 4},
    }
    doc.update(over)
    return doc


def _rows(spark, doc: str):
    df = spark.createDataFrame([(doc,)], "body string")
    out = df.select(
        F.explode(parse_mongodb_server_status(F.col("body"))).alias("m")
    ).select("m.*").collect()
    return {(r["name"], r["type"], r["state"], r["mode"], r["micros"],
             r["engine"]): (r["mtype"], r["value"]) for r in out}


def test_mongodb_full_document(spark):
    got = _rows(spark, json.dumps(_full_doc()))

    assert got[("asserts_total", "warning", None, None, None, None)] == ("counter", 2.0)
    # connections are counters in the reference (mod.rs:322-337)
    assert got[("connections", None, "available", None, None, None)] == ("counter", 100.0)
    assert got[("extra_info_heap_usage_bytes", None, None, None, None, None)][1] == 55555.0
    assert got[("extra_info_page_faults", None, None, None, None, None)] == ("gauge", 17.0)
    # epoch seconds via millis DIV 1000
    assert got[("instance_local_time", None, None, None, None, None)][1] == 1767323045.0
    assert got[("instance_uptime_seconds_total", None, None, None, None, None)][1] == 37.5
    assert got[("memory", "resident", None, None, None, None)][1] == 81.0
    assert got[("memory", "mapped", None, None, None, None)][1] == 10.0
    assert ("memory", "mapped_with_journal", None, None, None, None) not in got
    assert got[("mongod_global_lock_current_queue", "readers", None, None, None, None)][1] == 4.0
    # locks: present modes only, micros as-is (counter!(value))
    assert got[("mongod_locks_time_acquiring_global_seconds_total",
                "Global", None, "read", None, None)][1] == 1000.0
    assert got[("mongod_locks_time_acquiring_global_seconds_total",
                "Database", None, "write", None, None)][1] == 300.0
    assert not any(k[1] == "Oplog" for k in got)
    assert got[("mongod_metrics_cursor_open", None, "no_timeout", None, None, None)][1] == 0.0
    # Rust i64 truncation: 2500/1000=2, 1999/1000=1, 4001/1000=4
    assert got[("mongod_metrics_get_last_error_wtime_seconds_total",
                None, None, None, None, None)][1] == 2.0
    assert got[("mongod_metrics_repl_apply_batches_seconds_total",
                None, None, None, None, None)][1] == 1.0
    assert got[("mongod_metrics_repl_network_getmores_seconds_total",
                None, None, None, None, None)][1] == 4.0
    assert got[("mongod_metrics_query_executor_total", None,
                "collection_scans", None, None, None)][1] == 7.0
    assert got[("mongod_metrics_record_moves_total", None, None, None, None, None)][1] == 3.0
    # op latencies: histogram buckets tagged micros, empty histogram ok
    assert got[("mongod_op_latencies_histogram", "reads", None, None, "2", None)][1] == 20.0
    assert got[("mongod_op_latencies_latency", "writes", None, None, None, None)][1] == 7000.0
    assert got[("mongod_op_latencies_ops_total", "reads", None, None, None, None)][1] == 50.0
    assert got[("mongod_storage_engine", None, None, None, None, "wiredTiger")] == ("gauge", 1.0)
    # wiredTiger: checkpoint ms DIV 1000 (1500->1, 4999->4, 9999->9)
    assert got[("mongod_wiredtiger_transactions_checkpoint_seconds",
                "min", None, None, None, None)][1] == 1.0
    assert got[("mongod_wiredtiger_transactions_checkpoint_seconds",
                "max", None, None, None, None)][1] == 4.0
    assert got[("mongod_wiredtiger_transactions_checkpoint_seconds_total",
                None, None, None, None, None)][1] == 9.0
    assert got[("mongod_wiredtiger_blockmanager_blocks_total",
                "blocks_read_mapped", None, None, None, None)][1] == 6.0
    assert got[("mongod_wiredtiger_cache_max_bytes", None, None, None, None, None)][1] == 1e9
    assert got[("mongod_wiredtiger_concurrent_transactions_out_tickets",
                "read", None, None, None, None)][1] == 1.0
    assert got[("mongod_wiredtiger_session_open_sessions",
                None, None, None, None, None)][1] == 15.0
    # the reference's as-written opcounters swap (mod.rs:953-968)
    assert got[("op_counters_repl_total", "query", None, None, None, None)][1] == 2.0
    assert got[("op_counters_total", "command", None, None, None, None)][1] == 4.0
    assert got[("network_bytes_total", None, "bytes_out", None, None, None)][1] == 222.0


def test_mongodb_all_or_nothing(spark):
    # missing a required leaf (asserts.msg) -> zero metrics
    broken = _full_doc()
    del broken["asserts"]["msg"]
    # absent wiredTiger (Option) -> document still parses, no wt rows
    no_wt = _full_doc()
    del no_wt["wiredTiger"]
    # present-but-malformed wiredTiger -> whole document fails
    bad_wt = _full_doc()
    del bad_wt["wiredTiger"]["session"]
    df = spark.createDataFrame(
        [(json.dumps(broken),), (json.dumps(no_wt),),
         (json.dumps(bad_wt),), ("nope",), (None,)],
        "body string")
    ns = [r["n"] for r in df.select(
        F.size(parse_mongodb_server_status(F.col("body"))).alias("n")
    ).collect()]
    assert ns[0] == 0 and ns[2] == 0 and ns[3] == 0 and ns[4] == 0
    assert ns[1] > 50  # full minus the ~49 wiredTiger rows
