"""Streaming ops — each streaming variant, run with availableNow over a
bounded file source, must equal its batch twin (batch is the correctness
anchor; the reference has no watermarks, SURVEY.md §2.9)."""

import pytest
from pyspark.sql import functions as F

from vector_spark.operators import aggregate_metrics, dedupe, reduce_sessions, throttle
from vector_spark.plans import pages_pipeline
from vector_spark.sources import generate_pages, geo_dim, lang_dim
from vector_spark.streaming import (
    stream_aggregate,
    stream_dedupe,
    stream_pages_pipeline,
    stream_reduce_sessions,
    stream_throttle,
)

from conftest import rows, ts


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "events")
    df = spark.createDataFrame(
        [
            (1, "cpu", "h1", ts(0, 1), 1.0),
            (2, "cpu", "h1", ts(0, 4), 2.0),
            (3, "mem", "h2", ts(0, 2), 50.0),
            (4, "mem", "h2", ts(0, 8), 70.0),
            (5, "cpu", "h1", ts(30, 0), 8.0),
            (6, "cpu", "h1", ts(0, 1), 99.0),  # dup key (name,host,ts) of 1
        ],
        "event_id long, name string, host string, ts timestamp, value double",
    )
    df.write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, sdf, tmp_path, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name in ("dedupe", "throttle", "reduce_max") else "complete")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)

def test_stream_aggregate_equals_batch(spark, events_dir, tmp_path):
    sdf = stream_aggregate(
        _read_stream(spark, events_dir), "sum", 600, series_cols=["name"]
    )
    got = _run_stream(spark, sdf, tmp_path, "agg")
    batch = aggregate_metrics(
        spark.read.parquet(events_dir), "sum", 600, series_cols=["name"]
    ).withColumnRenamed("agg_value", "agg_value")
    assert rows(got) == rows(batch)


def test_stream_dedupe_equals_batch_any(spark, events_dir, tmp_path):
    sdf = stream_dedupe(_read_stream(spark, events_dir), ["name", "host", "ts"])
    got = _run_stream(spark, sdf, tmp_path, "dedupe")
    batch = dedupe(spark.read.parquet(events_dir), match=["name", "host", "ts"], keep="any")
    assert got.count() == batch.count() == 5
    assert rows(got, "name", "host", "ts") == rows(batch, "name", "host", "ts")


def test_stream_reduce_sessions_equals_batch(spark, events_dir, tmp_path):
    sdf = stream_reduce_sessions(
        _read_stream(spark, events_dir), ["name"], gap_secs=900
    )
    got = _run_stream(spark, sdf, tmp_path, "sess")
    batch = reduce_sessions(
        spark.read.parquet(events_dir), ["name"], {"value_sum": ("sum", "value")},
        ts_col="ts", gap_secs=900, order_col=["ts", "event_id"],
    ).select(
        F.unix_micros(F.col("ts")).alias("session_start_us"),
        "name", "events_merged", "value_sum",
    )
    assert rows(got) == rows(batch)


def test_stream_throttle_threshold(spark, events_dir, tmp_path):
    sdf = stream_throttle(
        _read_stream(spark, events_dir), threshold=2, window_secs=600, key_cols=["name"]
    )
    got = _run_stream(spark, sdf, tmp_path, "throttle")
    batch = throttle(
        spark.read.parquet(events_dir), threshold=2, window_secs=600,
        key_cols=["name"], ts_col="ts", order_col="ts",
    )
    assert got.count() == batch.count()
    assert rows(got, "name", "ts") == rows(batch, "name", "ts")


def test_stream_pages_pipeline_equals_batch(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    generate_pages(spark, 2000, partitions=4).write.parquet(pages_path)
    sdf = stream_pages_pipeline(
        _read_stream(spark, pages_path), geo_dim(spark), lang_dim(spark)
    )
    got = _run_stream(spark, sdf, tmp_path, "pipeline")
    batch = (
        pages_pipeline(spark.read.parquet(pages_path), geo_dim(spark), lang_dim(spark))["sink_counts"]
        .select("window_start", "route", "geo_region", "events", "bytes")
    )
    assert rows(got) == rows(batch)


def test_stream_route_to_sinks_and_resume(spark, tmp_path):
    """Streaming multi-sink fan-out: routed parquet sinks must equal the
    batch routed_union; restarting over the same source is a no-op (file-
    source checkpoint resume); new files are picked up incrementally."""
    from vector_spark.operators.route import routed_union
    from vector_spark.streaming import stream_route_to_sinks

    src_dir, sink_dir, ck = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ck")
    pages1 = generate_pages(spark, 1000, partitions=2)
    pages1.write.mode("append").parquet(src_dir)

    conds = {"errors": "lang = 'de'", "english": "lang = 'en'"}
    schema = spark.read.parquet(src_dir).schema

    def run_drain():
        q = stream_route_to_sinks(
            spark.readStream.schema(schema).parquet(src_dir), conds, sink_dir, ck
        )
        q.awaitTermination(120)

    run_drain()
    got = spark.read.parquet(sink_dir)
    expect = routed_union(spark.read.parquet(src_dir), conds)
    assert got.count() == expect.count()
    assert got.filter("route = 'errors'").count() == \
        spark.read.parquet(src_dir).filter("lang = 'de'").count()

    # restart with no new data -> nothing re-written (exactly-once resume)
    run_drain()
    assert spark.read.parquet(sink_dir).count() == expect.count()

    # new files arrive -> only the delta is processed
    generate_pages(spark, 500, partitions=1, seed=43).write.mode("append").parquet(src_dir)
    run_drain()
    total_expect = routed_union(spark.read.parquet(src_dir), conds).count()
    assert spark.read.parquet(sink_dir).count() == total_expect

    # crash between batch write and checkpoint commit: drop the newest
    # commit marker so the restart REPLAYS the last batch — the batch_id-
    # keyed dynamic overwrite must make the redo idempotent (no dupes)
    import pathlib

    commits = sorted(pathlib.Path(ck, "commits").glob("[0-9]*"), key=lambda p: int(p.name))
    crc = commits[-1].with_name(f".{commits[-1].name}.crc")
    commits[-1].unlink()
    if crc.exists():  # local-fs checksum sidecar would block the re-commit rename
        crc.unlink()
    run_drain()
    assert spark.read.parquet(sink_dir).count() == total_expect


def test_stream_hash_replace_state_across_batches(spark, tmp_path):
    """Seen-state persists across micro-batches: a value first seen in
    batch 1 is replaced by its hash when it reappears in batch 2."""
    from vector_spark.streaming import stream_hash_replace

    src, out_dir = str(tmp_path / "hr_src"), str(tmp_path / "hr_out")
    spark.createDataFrame(
        [("k", ts(0, 0), "payload-a"), ("k", ts(0, 1), "payload-b")],
        "key string, ts timestamp, body string",
    ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        # parquet sink: recoverable, so the operator state survives restarts
        q = (
            stream_hash_replace(
                spark.readStream.schema(schema).parquet(src), "body", ["key"]
            )
            .writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "hr_ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    out1 = drain()
    assert out1.filter("body is not null").count() == 2

    # batch 2: repeat of payload-a -> hash only (state recovered)
    spark.createDataFrame(
        [("k", ts(0, 5), "payload-a"), ("k", ts(0, 6), "payload-c")],
        "key string, ts timestamp, body string",
    ).write.mode("append").parquet(src)
    got = {(r.ts, r.body) for r in drain().collect()}
    assert (ts(0, 5), None) in got       # repeat: raw removed
    assert (ts(0, 6), "payload-c") in got  # new value kept


def test_stream_tag_cardinality_limit_state(spark, tmp_path):
    from vector_spark.streaming import stream_tag_cardinality_limit

    src = str(tmp_path / "tc_src")
    spark.createDataFrame(
        [("k", ts(0, 0), "a"), ("k", ts(0, 1), "b"), ("k", ts(0, 2), "c"),
         ("k", ts(0, 3), "a")],
        "key string, ts timestamp, tag string",
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    q = (
        stream_tag_cardinality_limit(
            spark.readStream.schema(schema).parquet(src), "tag", 2, ["key"]
        )
        .writeStream.format("memory").queryName("tcl").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "tc_ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.ts, r.tag) for r in spark.sql("select * from tcl").collect()}
    assert (ts(0, 0), "a") in got and (ts(0, 1), "b") in got
    assert (ts(0, 2), None) in got   # third distinct value -> tag dropped
    assert (ts(0, 3), "a") in got    # allowed value stays allowed


def test_stream_reduce_max_events_equals_batch(spark, tmp_path):
    """stream_reduce_max_events over a bounded source must produce the same
    closed chunks as reduce_sessions(max_events=N); the still-open tail
    session stays in state (not emitted), so compare against batch minus
    each group's last chunk when it's unfinished."""
    from vector_spark.streaming import stream_reduce_max_events

    src = str(tmp_path / "src")
    rows_in = [
        # group a: 7 events, 10s apart -> chunks of 3,3 then 1 left open
        *[(i, "a", ts((i * 10) // 60, (i * 10) % 60), 1.0) for i in range(7)],
        # group b: 2 events, then a >60s gap closes them, then 1 open
        (10, "b", ts(0, 0), 5.0), (11, "b", ts(0, 10), 5.0),
        (12, "b", ts(10, 0), 7.0),
    ]
    spark.createDataFrame(
        rows_in, "event_id long, g string, ts timestamp, value double"
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    sdf = stream_reduce_max_events(
        spark.readStream.schema(schema).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp")),
        ["g"], gap_secs=60, max_events=3,
    )
    got = _run_stream(spark, sdf, tmp_path, "reduce_max")
    emitted = sorted(
        (r.g, r.session_start_us, r.events_merged, r.value_sum) for r in got.collect()
    )
    assert emitted == [
        ("a", int(ts(0, 0).timestamp() * 1e6), 3, 3.0),
        ("a", int(ts(0, 30).timestamp() * 1e6), 3, 3.0),
        ("b", int(ts(0, 0).timestamp() * 1e6), 2, 10.0),
    ]


def test_stream_reduce_period_flush(spark, tmp_path):
    """end_every_secs in streaming: a continuous run (no gaps) splits at
    each 60s period boundary measured from the session's first event;
    the open tail chunk stays in state."""
    from vector_spark.streaming import stream_reduce_max_events

    src = str(tmp_path / "src_p")
    rows_in = [(i, "a", ts((i * 20) // 60, (i * 20) % 60), 1.0) for i in range(8)]
    spark.createDataFrame(
        rows_in, "event_id long, g string, ts timestamp, value double"
    ).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    sdf = stream_reduce_max_events(
        spark.readStream.schema(schema).parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp")),
        ["g"], gap_secs=3600, end_every_secs=60,
    )
    got = _run_stream(spark, sdf, tmp_path, "reduce_max")
    emitted = sorted((r.session_start_us, r.events_merged) for r in got.collect())
    # batch chunks are 3/3/2; the last (2-event) chunk is open -> state
    assert emitted == [
        (int(ts(0, 0).timestamp() * 1e6), 3),
        (int(ts(1, 0).timestamp() * 1e6), 3),
    ]


def test_stream_reduce_merges_equals_batch(spark, tmp_path):
    """Full merge parity: stream_reduce_merges with discard/retain/array/
    concat/max/sum must equal reduce_sessions exactly under availableNow.
    Every chunk closes via max_events (counts divisible by 3), so the
    streaming side emits everything the batch side does."""
    from vector_spark.operators.reduce import reduce_sessions
    from vector_spark.streaming import stream_reduce_merges

    src = str(tmp_path / "srm_src")
    rows_in = [
        # group a: one session of 6 (10s apart) -> two closed 3-chunks
        *[(i, "a", ts((i * 10) // 60, (i * 10) % 60), float(i + 1), f"m{i}")
          for i in range(6)],
        # group b: 3 events, >60s gap, 3 more -> two closed sessions
        *[(10 + i, "b", ts(0, i), 10.0 + i, f"x{i}") for i in range(3)],
        *[(20 + i, "b", ts(30, i), 20.0 + i, f"y{i}") for i in range(3)],
    ]
    spark.createDataFrame(
        rows_in, "event_id long, g string, ts timestamp, value double, body string"
    ).write.mode("overwrite").parquet(src)

    merges = {
        "first_body": ("discard", "body"),
        "last_body": ("retain", "body"),
        "all_bodies": ("array", "body"),
        "joined": ("concat", "body"),
        "v_max": ("max", "value"),
        "v_sum": ("sum", "value"),
    }
    schema = spark.read.parquet(src).schema
    sdf = stream_reduce_merges(
        spark.readStream.schema(schema).parquet(src),
        ["g"], gap_secs=60, merges=merges,
        types={"all_bodies": "array<string>", "v_max": "double", "v_sum": "double"},
        max_events=3,
    )
    got = _run_stream(spark, sdf, tmp_path, "reduce_max")
    stream_rows = sorted(
        (r.g, r.session_start_us, r.ts_end_us, r.events_merged, r.first_body,
         r.last_body, tuple(r.all_bodies), r.joined, r.v_max, r.v_sum)
        for r in got.collect()
    )
    batch = reduce_sessions(
        spark.read.parquet(src), ["g"], merges,
        gap_secs=60, max_events=3, order_col="ts",
    )
    batch_rows = sorted(
        (r.g, int(r.ts.timestamp() * 1e6), int(r.ts_end.timestamp() * 1e6),
         r.events_merged, r.first_body, r.last_body, tuple(r.all_bodies),
         r.joined, r.v_max, r.v_sum)
        for r in batch.collect()
    )
    assert len(stream_rows) == 4
    assert stream_rows == batch_rows


def test_stream_netflow_template_cache_survives_restart(spark, tmp_path):
    """The streaming NetFlow decoder's template cache persists in the
    streaming checkpoint: a template seen in run 1 decodes data packets
    arriving in run 2 (restart) — the reference's stateful-parser model."""
    from test_netflow import _flow_record, _v9_data_packet, _v9_template_packet
    from vector_spark.streaming import stream_parse_netflow

    src = str(tmp_path / "nf_src")
    ck = str(tmp_path / "nf_ck")
    sink = str(tmp_path / "nf_sink")

    def run_once(name):
        # parquet sink: the memory sink can't recover from a checkpoint,
        # and restart-recovery is exactly what this test proves
        schema = spark.read.parquet(src).schema
        q = (
            stream_parse_netflow(spark.readStream.schema(schema).parquet(src))
            .writeStream.format("parquet").outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        try:
            return spark.read.parquet(sink).collect()
        except Exception:
            return []  # sink dir empty: no rows emitted yet

    # run 1: template only -> no data rows
    spark.createDataFrame(
        [(bytearray(_v9_template_packet()),)], "packet binary"
    ).write.mode("overwrite").parquet(src)
    assert run_once("nf1") == []

    # run 2 (restart, same checkpoint): data only -> decoded via cached template
    rec = _flow_record("10.0.0.8", "192.168.1.1", 4000, 443, 2, 128, 6)
    spark.createDataFrame(
        [(bytearray(_v9_data_packet(256, [rec], unix_secs=1_700_000_900)),)],
        "packet binary",
    ).write.mode("append").parquet(src)
    out = run_once("nf2")
    assert len(out) == 1
    r = out[0]
    assert (r.version, r.source_id, r.template_id) == (9, 1, 256)
    assert dict(r.fields)["ipv4_src_addr"] == "10.0.0.8"
    assert dict(r.fields)["in_bytes"] == "128"


def test_stream_incremental_dedup_equals_batch(spark, tmp_path):
    """Stream-static exact-tier incremental dedup equals the batch
    operator's near=False output under availableNow."""
    from vector_spark.datapipe import incremental_dedup
    from vector_spark.streaming import stream_incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id long, text string"
    )
    delta_path = str(tmp_path / "delta_docs")
    spark.createDataFrame(
        [(10, "a b c"), (11, "brand new"), (12, "x y z")],
        "doc_id long, text string",
    ).write.parquet(delta_path)

    schema = spark.read.parquet(delta_path).schema
    sdf = stream_incremental_dedup(
        spark.readStream.schema(schema).parquet(delta_path), corpus
    )
    q = (
        sdf.writeStream.format("memory").queryName("inc_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_inc"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = rows(spark.sql("select * from inc_dedup"))
    batch = rows(incremental_dedup(spark.read.parquet(delta_path), corpus, near=False))
    assert got == batch
    assert sorted((r.doc_id, r.novel, r.dup_of) for r in spark.sql(
        "select * from inc_dedup").collect()) == [(10, False, 1), (11, True, None), (12, False, 3)]


def test_stream_incremental_dedup_near_tier(spark, tmp_path):
    """near=True streaming twin equals the batch near tier under
    availableNow — same minhash family, exact tier precedence — including
    a corpus UPDATE between micro-batches (static side re-planned on
    resume picks up the new corpus rows)."""
    from vector_spark.datapipe import incremental_dedup
    from vector_spark.streaming import stream_incremental_dedup

    corpus_path = str(tmp_path / "corpus_docs")
    delta_path = str(tmp_path / "near_delta")
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over dogs"), (2, "completely different words here")],
        "doc_id long, text string",
    ).write.parquet(corpus_path)
    spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over dogs"),   # exact dup of 1
            (11, "the quick brown fox jumps over cats"),   # near dup of 1
            (12, "nothing like anything in the corpus at all"),
        ],
        "doc_id long, text string",
    ).write.parquet(delta_path)

    schema = spark.read.parquet(delta_path).schema

    sink_path = str(tmp_path / "near_sink")

    def run_stream():
        # parquet sink: supports checkpoint RESUME (memory sink does not),
        # which the corpus-update case below depends on
        sdf = stream_incremental_dedup(
            spark.readStream.schema(schema).parquet(delta_path),
            spark.read.parquet(corpus_path),
            near=True,
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", sink_path)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_near"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {
            r.doc_id: (r.novel, r.dup_of)
            for r in spark.read.parquet(sink_path).collect()
        }

    got = run_stream()
    batch = {
        r.doc_id: (r.novel, r.dup_of)
        for r in incremental_dedup(
            spark.read.parquet(delta_path), spark.read.parquet(corpus_path), near=True
        ).collect()
    }
    assert got == batch
    assert got[10] == (False, 1)      # exact tier
    assert got[11] == (False, 1)      # near tier
    assert got[12] == (True, None)

    # corpus update between micro-batches: a new corpus doc arrives AND a
    # new delta file lands; resuming the same checkpoint must classify the
    # new delta doc against the UPDATED corpus
    spark.createDataFrame(
        [(3, "nothing like anything in the corpus at most")],  # near of 13
        "doc_id long, text string",
    ).write.mode("append").parquet(corpus_path)
    spark.createDataFrame(
        [(13, "nothing like anything in the corpus at most")],
        "doc_id long, text string",
    ).write.mode("append").parquet(delta_path)
    got2 = run_stream()  # only the NEW delta file is processed (append)
    assert got2 == {**got, 13: (False, 3)}


def test_stream_bloom_probe_equals_batch(spark, tmp_path):
    """Stateless stream-static Bloom probe equals the batch
    bloom_filter_probe under availableNow (same filter, same hash family),
    true dups flagged, fresh docs passing."""
    from vector_spark.datapipe import bloom_filter_build, bloom_filter_probe
    from vector_spark.streaming import stream_bloom_probe

    corpus = spark.createDataFrame(
        [(f"known text {i}",) for i in range(30)], "text string")
    bloom = bloom_filter_build(corpus, "text")
    delta_path = str(tmp_path / "bloom_delta")
    spark.createDataFrame(
        [(i, f"known text {i}" if i % 2 == 0 else f"fresh {i}")
         for i in range(10)],
        "doc_id long, text string").write.parquet(delta_path)

    schema = spark.read.parquet(delta_path).schema
    sdf = stream_bloom_probe(
        spark.readStream.schema(schema).parquet(delta_path), bloom)
    q = (
        sdf.writeStream.format("memory").queryName("bloom_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_bloom"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = rows(spark.sql("select * from bloom_probe"))
    batch = rows(bloom_filter_probe(spark.read.parquet(delta_path), bloom))
    assert got == batch
    assert sorted((r.doc_id, r.maybe_dup) for r in
                  spark.sql("select * from bloom_probe").collect()) == [
        (i, i % 2 == 0) for i in range(10)]


def test_stream_hll_and_count_min_equal_batch(spark, tmp_path):
    """Streaming sketch maintenance (bounded-state aggregations, no
    watermark) equals the batch sketches over the same data under
    availableNow + complete mode, and the streamed HLL register table
    feeds the batch estimator unchanged."""
    from vector_spark.datapipe import count_min_build, hll_estimate, hll_sketch
    from vector_spark.streaming import stream_count_min, stream_hll_sketch

    path = str(tmp_path / "sketch_stream")
    spark.createDataFrame(
        [(f"v{i % 40}",) for i in range(400)], "v string").write.parquet(path)
    schema = spark.read.parquet(path).schema
    sdf = spark.readStream.schema(schema).parquet(path)

    for name, op in (("hll_regs", stream_hll_sketch),
                     ("cm_cells", stream_count_min)):
        q = (op(sdf, "v").writeStream.format("memory").queryName(name)
             .outputMode("complete")
             .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    batch_df = spark.read.parquet(path)
    assert rows(spark.sql("select * from hll_regs")) == \
        rows(hll_sketch(batch_df, "v"))
    assert rows(spark.sql("select * from cm_cells")) == \
        rows(count_min_build(batch_df, "v"))
    est = hll_estimate(spark.table("hll_regs")).collect()[0].n_est
    assert abs(est - 40) <= 2


def test_stream_hll_grouped_and_asof_enrich(spark, tmp_path):
    """Round-4 tail twins: (a) grouped streaming HLL registers equal the
    batch grouped sketch (bounded groups x 2^p state); (b) enrich_asof is
    stream-safe as-is — the dim-side interval window runs on the STATIC
    side, so the stream-static broadcast join stays stateless."""
    import datetime as dt

    from vector_spark.datapipe import hll_sketch
    from vector_spark.operators import enrich_asof

    path = str(tmp_path / "grp_stream")
    spark.createDataFrame(
        [("g%d" % (i % 2), "v%d" % (i % 30),
          dt.datetime(2024, 1, 1, i % 24)) for i in range(200)],
        "g string, v string, t timestamp").write.parquet(path)
    schema = spark.read.parquet(path).schema
    sdf = spark.readStream.schema(schema).parquet(path)

    q = (hll_sketch(sdf, "v", group_cols=["g"])
         .writeStream.format("memory").queryName("hll_grp")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck_grp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert rows(spark.sql("select * from hll_grp")) == \
        rows(hll_sketch(spark.read.parquet(path), "v", group_cols=["g"]))

    dim = spark.createDataFrame(
        [("g0", dt.datetime(2024, 1, 1, 0), "seg_a"),
         ("g0", dt.datetime(2024, 1, 1, 12), "seg_b"),
         ("g1", dt.datetime(2024, 1, 1, 6), "seg_c")],
        "g string, valid_from timestamp, seg string")
    enriched = enrich_asof(sdf, dim, ("g", "g"), ts_col="t",
                           dim_ts_col="valid_from")
    q2 = (enriched.writeStream.format("memory").queryName("asof_stream")
          .outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ck_asof"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got = rows(spark.sql("select * from asof_stream"))
    batch = rows(enrich_asof(spark.read.parquet(path), dim, ("g", "g"),
                             ts_col="t", dim_ts_col="valid_from"))
    assert got == batch
    segs = {r.seg for r in spark.sql("select * from asof_stream").collect()}
    assert segs == {"seg_a", "seg_b", "seg_c", None}  # g1 before 06:00 -> null


def test_stream_script_stateful_state_survives_restart(spark, tmp_path):
    """Streaming lua analogue: the user hook's per-key state (a running
    event count) persists across micro-batches AND a restart — run 1
    processes file A, run 2 (same checkpoint) processes only file B, and
    the counts continue from run 1's state."""
    from vector_spark.streaming import stream_script_stateful

    src = tmp_path / "script_src"
    src.mkdir()
    sink = str(tmp_path / "script_sink")
    ck = str(tmp_path / "script_ck")

    def hook(key, pdf, state):
        import pandas as pd
        n = state.get("n", 0)
        pdf = pdf.sort_values("event_id")
        seqs = list(range(n + 1, n + len(pdf) + 1))
        out = pd.DataFrame({
            "k": [key[0]] * len(pdf),
            "event_id": pdf.event_id.to_list(),
            "seq": seqs,
        })
        return out, {"n": n + len(pdf)}

    schema = "k string, event_id long, seq long"

    def run_once():
        sdf = spark.readStream.schema("k string, event_id long").parquet(str(src))
        q = (stream_script_stateful(sdf, hook, ["k"], schema)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, event_id long"
    ).write.parquet(str(src / "f1"))
    # readStream over a directory tree needs the glob to see subdirs
    import shutil
    for f in (src / "f1").glob("*.parquet"):
        shutil.move(str(f), str(src / f.name))
    shutil.rmtree(str(src / "f1"))
    run_once()

    spark.createDataFrame(
        [("a", 4), ("b", 5)], "k string, event_id long"
    ).write.parquet(str(src / "f2"))
    for f in (src / "f2").glob("*.parquet"):
        shutil.move(str(f), str(src / ("g" + f.name)))
    shutil.rmtree(str(src / "f2"))
    run_once()

    got = sorted((r.k, r.event_id, r.seq)
                 for r in spark.read.parquet(sink).collect())
    # per-key sequence numbers continue across the restart: a saw 1,2 then
    # 4 -> seq 1,2,3; b saw 3 then 5 -> seq 1,2
    assert got == [("a", 1, 1), ("a", 2, 2), ("a", 4, 3),
                   ("b", 3, 1), ("b", 5, 2)]


def test_decontaminate_semantic_streaming_composes(spark, tmp_path):
    """decontaminate_semantic is stateless per row (static benchmark rides
    a broadcast; assignment is a narrow fold), so the SAME operator
    composes onto a readStream unchanged — the availableNow run must equal
    the batch output exactly. The one adjustment: ensure_parallelism
    no-ops on streaming input (repartition of a stream is legal, but the
    split-estimate path must not choke)."""
    from vector_spark.datapipe import decontaminate_semantic

    src = str(tmp_path / "vecs")
    rows_ = [(i, [float(i % 5), 1.0, float(i % 3)]) for i in range(40)]
    spark.createDataFrame(rows_, "vec_id long, embedding array<float>").write.parquet(src)
    bench = spark.createDataFrame(
        [(100, [1.0, 1.0, 0.0]), (101, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    batch = decontaminate_semantic(
        spark.read.parquet(src), bench, threshold=0.8
    )
    schema = spark.read.parquet(src).schema
    sdf = decontaminate_semantic(
        spark.readStream.schema(schema).parquet(src), bench, threshold=0.8
    )
    sink = str(tmp_path / "sink")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = lambda r: (r.vec_id, r.bench_id, r.max_cos, r.keep)
    assert sorted(map(key, spark.read.parquet(sink).collect())) == sorted(
        map(key, batch.collect())
    )
