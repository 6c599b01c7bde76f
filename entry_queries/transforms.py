"""Vector transform/operator contract queries + oracles (remap/filter/route/dedupe/reduce/aggregate/sample/throttle/enrich/topology/streaming)."""

from .common import *  # noqa: F401,F403
from .common import _t, _dsum, DSUM_SQL, ROUTES
from .common import _BP_NAV, _BP_LEAD, _BP_TAIL  # noqa: F401
from .oracle_helpers import (  # noqa: F401
    _boilerplate_sql,
    _hexval_sql,
    _simhash_sql,
    _minhash_sql,
    _aggregate_sketch_sql,
    _langid_sql,
    _repetition_sql,
    _ann_lsh_sql,
    _near_dup_sql,
    _html_text_sql,
)

def q_remap_parse_json(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.concat(F.col("event_type"), F.lit(":"), F.col("user_id").cast("string")).alias("msg"),
        F.floor(F.col("value") / 50).cast("long").alias("value_bucket"),
    )


def q_filter_errors(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return filter_events(e, (F.col("event_type") == "error") & (F.col("value") > 100)).select(
        "event_id", "user_id", "event_type", "value"
    )


def q_route_multi(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return routed_union(e, ROUTES).select("event_id", "route")


def q_route_exclusive(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return exclusive_route(e, ROUTES).select("event_id", "route")


def q_dedupe_first(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return dedupe(e, match=["user_id", "event_type"], order_by="event_id", keep="first").select(
        "event_id", "user_id", "event_type"
    )


def q_dedupe_lru(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return dedupe(e, match=["user_id", "event_type"], order_by="event_id", lru_window=50).select(
        "event_id"
    )


def q_sample_hash(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return sample(e, 16, key_field="event_id", method="md5").select("event_id", "sample_rate")


def q_reduce_sessions(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    out = reduce_sessions(
        e,
        ["user_id"],
        {
            "value_sum": ("sum", "value"),
            "first_type": ("discard", "event_type"),
            "last_type": ("retain", "event_type"),
            "n_types": ("count", "event_type"),
        },
        ts_col="ts",
        gap_secs=3600,
        order_col=["ts", "event_id"],
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("session_start_us"),
        F.unix_micros(F.col("ts_end").cast("timestamp")).alias("session_end_us"),
        "events_merged",
        F.round("value_sum", 3).alias("value_sum"),
        "first_type",
        "last_type",
    )


def q_aggregate_tumbling(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        tumbling_window(F.col("ts"), 86400).alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("events"),
        _dsum(F.col("value"), "value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


def q_aggregate_latest(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return aggregate_metrics(
        e, "latest", window_secs=86400, ts_col="ts", series_cols=["event_type"],
        value_col="value", order_col="event_id",
    ).withColumnRenamed("agg_value", "latest_value")


def q_aggregate_stdev(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    out = aggregate_metrics(
        e, "stdev", window_secs=86400 * 7, ts_col="ts", series_cols=["event_type"], value_col="value"
    )
    return out.select(
        "window_start", "event_type", F.round("agg_value", 4).alias("value_stdev")
    )


def q_aggregate_diff(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    summed = e.groupBy(
        tumbling_window(F.col("ts"), 86400).alias("window_start"), "event_type"
    ).agg(_dsum(F.col("value"), "s"))
    w = Window.partitionBy("event_type").orderBy("window_start")
    return summed.select(
        "window_start",
        "event_type",
        (F.col("s") - F.lag("s").over(w)).alias("diff_value"),
    )


def q_throttle(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return throttle(
        e, threshold=5, window_secs=86400, key_cols=["user_id"], ts_col="ts", order_col="event_id"
    ).select("event_id")


def q_log_to_metric(spark, sf_dir):
    """Spec-mode log_to_metric over all five metric-type configs —
    histogram/summary specs emit a one-sample Distribution
    (log_to_metric.rs:431-470: Incremental, statistic tag)."""
    e = _t(spark, sf_dir, "events")
    return log_to_metric(
        e,
        [
            MetricSpec("counter", "events_total"),
            MetricSpec("counter", "purchase_value", value=F.col("value"),
                       when=F.col("event_type") == "purchase"),
            MetricSpec("gauge", "user_gauge", value=F.col("user_id").cast("double")),
            MetricSpec("histogram", "latency_hist", value=F.col("value")),
            MetricSpec("summary", "latency_sum", value=F.col("value") * 2,
                       when=F.col("event_type") == "view"),
        ],
        carry=["event_id"],
    )


def _all_metrics_doc(e):
    """Metric-shaped JSON per event: one value-object family per
    event_id%7 incl. both Distribution statistics, aggregated
    histogram/summary, set, and an invalid class (bad kind / missing
    name) that must be dropped."""
    s = lambda c: c.cast("string")  # noqa: E731
    m = F.col("event_id") % 7
    v = F.round(F.col("value"), 2)
    name = F.concat(F.lit("m"), s(F.col("event_id") % 50))
    stat = F.when(F.col("user_id") % 2 == 0, F.lit("histogram")).otherwise(
        F.lit("summary"))
    kind = F.when(F.col("event_id") % 2 == 0, F.lit("incremental")).otherwise(
        F.lit("absolute"))
    head = F.concat(
        F.lit('{"name": "'), name, F.lit('", "kind": "'), kind,
        F.lit('", "namespace": "ns'), s(F.col("user_id") % 3),
        F.lit('", "tags": {"env": "e'), s(F.col("user_id") % 4),
        F.lit('"}, '),
    )
    body = (
        F.when(m == 0, F.concat(F.lit('"counter": {"value": '), s(v), F.lit("}")))
        .when(m == 1, F.concat(F.lit('"gauge": {"value": '), s(v), F.lit("}")))
        .when(m == 2, F.concat(
            F.lit('"set": {"values": ["s'), s(F.col("user_id") % 5),
            F.lit('", "t'), s(F.col("event_id") % 9), F.lit('"]}')))
        .when(m == 3, F.concat(
            F.lit('"distribution": {"samples": [{"value": '), s(v),
            F.lit(', "rate": 1}, {"value": '), s(v * 2),
            F.lit(', "rate": '), s(F.col("user_id") % 7 + 1),
            F.lit('}], "statistic": "'), stat, F.lit('"}')))
        .when(m == 4, F.concat(
            F.lit('"histogram": {"buckets": [{"upper_limit": 1.5, "count": '),
            s(F.col("user_id") % 10),
            F.lit('}, {"upper_limit": 5.0, "count": '),
            s(F.col("event_id") % 11),
            F.lit('}], "count": '), s(F.col("event_id") % 100),
            F.lit(', "sum": '), s(v), F.lit("}")))
        .when(m == 5, F.concat(
            F.lit('"summary": {"quantiles": [{"quantile": 0.5, "value": '),
            s(v), F.lit('}, {"quantile": 0.9, "value": '), s(v * 3),
            F.lit('}], "count": '), s(F.col("event_id") % 100),
            F.lit(', "sum": '), s(v), F.lit("}")))
        .otherwise(F.lit('"counter": {"value": 1.0}'))
    )
    doc = F.concat(head, body, F.lit("}"))
    # invalid class: event_id%7==6 gets a bad kind (user even) or the
    # name clobbered to null (user odd) — both must drop
    return F.when(
        (m == 6) & (F.col("user_id") % 2 == 0),
        F.regexp_replace(doc, '"kind": "(incremental|absolute)"',
                         '"kind": "weird"'),
    ).when(
        (m == 6),
        F.regexp_replace(doc, '"name": "m[0-9]+"', '"name": null'),
    ).otherwise(doc)


def _flatten_all_metrics(out):
    """Typed metric rows -> scalar columns for the hash compare."""
    return out.select(
        "event_id", "name", "namespace", "kind", "metric_type",
        F.element_at("tags", "env").alias("tag_env"),
        "value",
        F.array_join("set_values", ",").alias("set_csv"),
        F.size(F.coalesce("samples", F.array().cast(
            "array<struct<value:double,rate:bigint>>"))).alias("n_samples"),
        F.round(F.aggregate(
            F.coalesce("samples", F.array().cast(
                "array<struct<value:double,rate:bigint>>")),
            F.lit(0.0), lambda a, x: a + x["value"] * x["rate"],
        ), 4).alias("sample_mass"),
        "statistic",
        F.size(F.coalesce("buckets", F.array().cast(
            "array<struct<upper_limit:double,count:bigint>>"))).alias("n_buckets"),
        F.size(F.coalesce("quantiles", F.array().cast(
            "array<struct<quantile:double,value:double>>"))).alias("n_quantiles"),
        "agg_count",
        F.round("agg_sum", 4).alias("agg_sum"),
    )


def q_log_to_metric_all(spark, sf_dir):
    """all_metrics mode (log_to_metric.rs:489-856): metric-shaped log
    events (metric_to_log's serialization) converted straight back to
    metrics — one value-object family per event_id%7 incl. both
    Distribution statistics, aggregated histogram/summary, set, and an
    invalid class (bad kind / missing name) that must be DROPPED.
    Arrays flattened to scalars for the hash compare."""
    from vector_spark.operators import log_to_metric_all

    e = _t(spark, sf_dir, "events")
    out = log_to_metric_all(
        e.withColumn("message", _all_metrics_doc(e)), carry=["event_id"])
    return _flatten_all_metrics(out)


def q_metric_to_log_roundtrip(spark, sf_dir):
    """metric_to_log_json is the reference's REAL serialization
    (metric_to_log.rs:283-335, serde of the Metric): verified by exact
    inversion — parse the metric-shaped fixture docs, serialize them
    back to JSON, parse AGAIN, and flatten identically to
    q_log_to_metric_all. The oracle is the SAME expected-rows SQL, so a
    serializer that drops/renames/retypes anything hash-mismatches."""
    from vector_spark.operators import log_to_metric_all, metric_to_log_json

    e = _t(spark, sf_dir, "events")
    metrics = log_to_metric_all(
        e.withColumn("message", _all_metrics_doc(e)), carry=["event_id"])
    # materialize the serialized strings between the two parse passes —
    # inlining parse->serialize->parse as ONE expression tree makes every
    # output column reference the whole (to_json . from_json) subtree and
    # codegen explodes (4.7s -> 91s measured); the checkpoint is
    # metric-rows-sized (the graph.py lazy-localCheckpoint precedent)
    logs = metric_to_log_json(metrics, carry=["event_id"]) \
        .localCheckpoint(eager=False)
    again = log_to_metric_all(logs, carry=["event_id"])
    return _flatten_all_metrics(again)


def q_metric_to_log(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    metrics = log_to_metric(
        e,
        [MetricSpec("counter", "purchase_value", value=F.col("value"),
                    when=F.col("event_type") == "purchase")],
        carry=["event_id"],
    )
    out = metric_to_log(
        metrics.withColumn("value", F.format_string("%.2f", F.col("value"))),
    )
    return out.select("event_id", "message")


def q_tag_cardinality_limit(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    out = tag_cardinality_limit(e, ["event_type"], value_limit=2, order_col="event_id")
    return out.select("event_id", F.col("event_type").alias("event_type_lim"))


def q_hash_replace(spark, sf_dir):
    """Two configured keys, forced onto the narrow-projection rank path
    (project=True: keep flags computed over (event_id, props, event_type)
    only; the wide rows shuffle once, on the unique event id). Auto mode
    would pick the windows path at K=2 — same oracle result, different
    physical strategy."""
    e = _t(spark, sf_dir, "events")
    return hash_replace(
        e, ["props", "event_type"], order_col="event_id", project=True
    ).select(
        "event_id", "props", "props_hash", "event_type", "event_type_hash"
    )


def q_enrich_customer(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    out = enrich_equi(e, c, [("user_id", "c_custkey")])
    out = enrich_equi(out, n, [("c_nationkey", "n_nationkey")])
    out = enrich_equi(out, r, [("n_regionkey", "r_regionkey")])
    return out.select("event_id", "c_name", "n_name", "r_name")


def q_enrich_between(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").withColumn(
        "valid_to", F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    out = enrich_between(
        li, o, ("l_orderkey", "o_orderkey"), ts_col="l_shipdate",
        from_col="o_orderdate", to_col="valid_to",
    )
    return out.select("l_orderkey", "l_linenumber", "o_orderpriority")


def q_script_transform(spark, sf_dir):
    """User-scripted transform (the lua-transform analogue,
    src/transforms/lua/v2/mod.rs): a pandas batch hook that DROPS German
    docs (0-emit) and EXPLODES each surviving doc into one event per
    leading word (N-emit, capped at 5) — exercising the 0..N contract the
    reference's hooks.process has. The hook body is vectorized pandas
    (filter + str.split + explode + cumcount), so the Python path runs at
    Arrow/pandas speed; the oracle re-derives the emit in SQL with the
    zip-unnest formulation."""
    from vector_spark.operators import script_transform

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")

    def hook(pdf):
        # SQL-NULL semantics, matching the oracle: `lang <> 'de'` drops NULL
        # lang; unnest(string_split(NULL)) emits 0 rows for NULL text
        pdf = pdf[pdf.lang.notna() & (pdf.lang != "de") & pdf.text.notna()]
        ex = pdf.assign(_w=pdf.text.str.split(" ")).explode("_w")
        ex["word_idx"] = ex.groupby("doc_id").cumcount()
        ex = ex[ex.word_idx < 5]
        return ex.assign(word_len=ex._w.str.len())[
            ["doc_id", "word_idx", "word_len"]]

    return script_transform(
        docs, hook, "doc_id long, word_idx long, word_len long")


def _multiline_lines_ct(spark, sf_dir):
    """Deterministic stack-trace-shaped lines from events: `error` events
    open an ERROR line, everything else is an indented frame line."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.when(
            F.col("event_type") == "error",
            F.concat(F.lit("ERROR evt "), F.col("event_id").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("  at frame_"), (F.col("event_id") % 7).cast("string"))
        )
        .alias("line"),
    )


def q_multiline_stacktrace(spark, sf_dir):
    """Multiline aggregation, continue_through mode (the Java-stack-trace
    config from the reference's own docs: start = non-whitespace column 0,
    condition = leading whitespace; lib/vector-common/src/multiline/
    line_agg.rs:24-31). This mode runs the CLOSED-FORM pure-window JVM path
    (operators/multiline.py::_segments_end_exclude) — the oracle is a
    recursive-CTE transcription of the reference's sequential state machine
    (line_agg.rs:301-366), a genuinely independent formulation."""
    from vector_spark.operators import multiline_agg

    return multiline_agg(
        _multiline_lines_ct(spark, sf_dir),
        start_pattern=r"^ERROR",
        condition_pattern=r"^\s",
        mode="continue_through",
        key_cols="user_id",
        order_col="event_id",
    )


def q_multiline_haltwith(spark, sf_dir):
    """Multiline aggregation, halt_with mode (statement terminated by `;`,
    line_agg.rs:43-47) — exercises the sequential EndInclude path (ids-only
    pandas fold; the text never crosses the Python boundary) including the
    vacant-buffer quirk that an opening line is never condition-checked."""
    from vector_spark.operators import multiline_agg

    ev = _t(spark, sf_dir, "events")
    lines = ev.select(
        "user_id",
        "event_id",
        F.concat(
            F.lit("stmt "),
            (F.col("event_id") % 13).cast("string"),
            F.when(F.col("event_id") % 5 == 0, F.lit(";")).otherwise(F.lit("")),
        ).alias("line"),
    )
    return multiline_agg(
        lines,
        start_pattern=r"^stmt",
        condition_pattern=r";$",
        mode="halt_with",
        key_cols="user_id",
        order_col="event_id",
    )


def q_enrich_asof(spark, sf_dir):
    """As-of (latest-version-at-event-time) enrichment: orders fan out into
    3 deterministic priority versions 30 days apart; every lineitem picks
    the newest version at its ship date via the dim-side-interval broadcast
    hash join (operators.enrich.enrich_asof — zero fact-side shuffle). The
    oracle derives the same intervals independently with lead() in DuckDB."""
    from vector_spark.operators import enrich_asof

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    dim = o.select(
        "o_orderkey",
        "o_orderdate",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("_v"),
        "o_orderpriority",
    ).select(
        "o_orderkey",
        F.date_add("o_orderdate", F.col("_v") * 30).alias("valid_from"),
        F.concat("o_orderpriority", F.lit("_v"),
                 F.col("_v").cast("string")).alias("prio_version"),
    )
    out = enrich_asof(
        li, dim, ("l_orderkey", "o_orderkey"),
        ts_col="l_shipdate", dim_ts_col="valid_from",
    )
    return out.select("l_orderkey", "l_linenumber", "prio_version")


def q_enrich_geoip(spark, sf_dir):
    """GeoIP-style IP-range enrichment (src/enrichment_tables/geoip.rs
    analogue): derive a deterministic IPv4 per event, range-join against the
    broadcast geoip dim via the block-exploded broadcast HASH join
    (operators.enrich.enrich_ip_range) — never a nested-loop join."""
    from vector_spark.operators import enrich_ip_range
    from vector_spark.sources import geoip_dim

    e = _t(spark, sf_dir, "events").withColumn(
        "ip",
        F.format_string(
            "10.%d.%d.%d",
            (F.col("user_id") % 128).cast("int"),
            (F.col("event_id") % 256).cast("int"),
            ((F.col("event_id") * 7) % 256).cast("int"),
        ),
    )
    dim = geoip_dim(spark).select("ip_start", "ip_end", "country", "region")
    out = enrich_ip_range(e, dim, "ip", prefix_bits=16)
    return out.select("event_id", "ip", "country", "region")


def q_enrich_geoip_mmdb(spark, sf_dir):
    """enrich_geoip twin fed from an actual .mmdb binary artifact: a
    deterministic spec-compliant MaxMind DB is built from the SAME geoip
    ranges (functions.mmdb.build_mmdb), decoded by the Arrow-batched tree
    walker (parse_mmdb — the reference reads these artifacts via maxminddb,
    src/enrichment_tables/geoip.rs:1-509 / mmdb.rs:1-274), and the exploded
    leaves drive the identical block-exploded broadcast hash range join.
    Oracle: same SQL as enrich_geoip — the artifact roundtrip must be
    value-invisible."""
    from vector_spark.functions.mmdb import build_mmdb, parse_mmdb
    from vector_spark.operators import enrich_ip_range
    from vector_spark.sources import geoip_ranges

    blob = build_mmdb(
        [(lo, hi, {"country": c, "region": r}) for _, _, lo, hi, c, r in geoip_ranges()],
        record_size=28,  # GeoLite2's usual width
    )
    mmdb_df = spark.createDataFrame([(bytearray(blob),)], "content binary")
    dim = parse_mmdb(mmdb_df).select(
        "ip_start",
        "ip_end",
        F.get_json_object("data_json", "$.country").alias("country"),
        F.get_json_object("data_json", "$.region").alias("region"),
    )
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.format_string(
            "10.%d.%d.%d",
            (F.col("user_id") % 128).cast("int"),
            (F.col("event_id") % 256).cast("int"),
            ((F.col("event_id") * 7) % 256).cast("int"),
        ).alias("ip"),
    )
    out = enrich_ip_range(e, dim, "ip", prefix_bits=16, numeric=True, fact_numeric=False)
    return out.select("event_id", "ip", "country", "region")


def _geoip6_ranges() -> list[tuple[int, int, dict]]:
    """Deterministic IPv6 fixture: 8 ranges under 2001:db8::/32, each
    covering four /48s (3rd hextet 4i..4i+3); hextets 32..39 uncovered
    (left-join null path)."""
    base = 0x20010DB8 << 96
    out = []
    for i in range(8):
        lo = base | (i * 4) << 80
        hi = base | ((i * 4 + 3) << 80) | ((1 << 80) - 1)
        out.append((lo, hi, {"country": f"C6{i}", "region": f"R{i % 3}"}))
    return out


def q_enrich_geoip6_mmdb(spark, sf_dir):
    """IPv6 geoip from an actual ip_version=6 .mmdb artifact: native
    128-bit ranges written by build_mmdb(v6_ranges=True), decoded by the
    parse_mmdb6 Arrow walker into fixed-width hex bounds, then
    enrich_ip6_range's block-exploded broadcast hash join (lexicographic
    hex compare == uint128 compare). Oracle: the same hex arithmetic as
    VALUES + printf-constructed fact hex."""
    from vector_spark.functions.mmdb import build_mmdb, parse_mmdb6
    from vector_spark.operators import enrich_ip6_range
    from vector_spark.session import ensure_parallelism

    blob = build_mmdb(_geoip6_ranges(), record_size=28, ip_version=6, v6_ranges=True)
    dim = parse_mmdb6(
        spark.createDataFrame([(bytearray(blob),)], "content binary")
    ).select(
        "ip_start_hex",
        "ip_end_hex",
        F.get_json_object("data_json", "$.country").alias("country"),
        F.get_json_object("data_json", "$.region").alias("region"),
    )
    # ipv6_expand's canonicalization is compute-heavy per row; a single
    # parquet file scans as ONE split without this
    e = ensure_parallelism(_t(spark, sf_dir, "events")).select(
        "event_id",
        F.format_string(
            "2001:db8:%x::%x",
            (F.col("user_id") % 40).cast("int"),
            (F.col("event_id") % 65536).cast("int"),
        ).alias("ip"),
    )
    out = enrich_ip6_range(e, dim, "ip")
    return out.select("event_id", "ip", "country", "region")


def q_pipeline_events_e2e(spark, sf_dir):
    """Flagship: parse -> enrich -> route -> aggregate on the events table
    (the testdata analogue of the pages topology)."""
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events")).withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    enriched = e.join(broadcast(c), e.user_id == c.c_custkey, "left") \
        .join(broadcast(n), c.c_nationkey == n.n_nationkey, "left") \
        .join(broadcast(r), n.n_regionkey == r.r_regionkey, "left")
    routed = exclusive_route(
        enriched,
        {
            "errors": F.col("event_type") == "error",
            "purchases": F.col("event_type") == "purchase",
            "high_k": F.col("k") >= 90,
        },
    )
    return routed.groupBy(
        "route",
        tumbling_window(F.col("ts"), 86400 * 7).alias("window_start"),
        F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("r_name"),
    ).agg(
        F.count(F.lit(1)).alias("events"),
        _dsum(F.col("value"), "value_sum"),
    )


def q_reduce_merge_full(spark, sf_dir):
    """Session reduce exercising the list-shaped merge strategies (array /
    concat / concat_newline) plus min/max."""
    e = _t(spark, sf_dir, "events")
    out = reduce_sessions(
        e,
        ["user_id"],
        {
            "types_arr": ("array", "event_type"),
            "types_cat": ("concat", "event_type"),
            "types_lines": ("concat_newline", "event_type"),
            "v_min": ("min", "value"),
            "v_max": ("max", "value"),
        },
        ts_col="ts",
        gap_secs=7200,
        order_col=["ts", "event_id"],
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("session_start_us"),
        "events_merged",
        F.array_join("types_arr", "|").alias("types_arr_joined"),
        "types_cat",
        "types_lines",
        F.round("v_min", 3).alias("v_min"),
        F.round("v_max", 3).alias("v_max"),
    )


def q_topology_events(spark, sf_dir):
    """The events pipeline expressed as a declarative topology spec and run
    through the config compiler (vector_spark.topology) — the `vector
    --config` analogue (SURVEY.md §3.1)."""
    from vector_spark.topology import compile_topology

    spec = {
        "sources": {"events": {"type": "parquet", "path": f"{sf_dir}/events.parquet"}},
        "transforms": {
            "tagged": {
                "type": "remap",
                "inputs": ["events"],
                "set": {"k": "CAST(get_json_object(props, '$.k') AS INT)"},
            },
            "labeled": {
                "type": "exclusive_route",
                "inputs": ["tagged"],
                "routes": {
                    "errors": "event_type = 'error'",
                    "purchases": "event_type = 'purchase'",
                    "high_k": "k >= 90",
                },
            },
        },
    }
    built = compile_topology(spec).build(spark)
    return (
        built["labeled"]
        .groupBy("route")
        .agg(F.count(F.lit(1)).alias("events"), _dsum(F.col("value"), "value_sum"))
    )


def q_streaming_aggregate(spark, sf_dir):
    """Streaming tumbling aggregate (availableNow over the bounded events
    table) — must match the batch oracle exactly (watermark semantics with
    no late data == batch)."""
    import tempfile

    from vector_spark.streaming import stream_aggregate

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks need TIMESTAMP (parquet holds NTZ; session tz is UTC so the
    # cast is a no-op on the epoch); exact decimal sum so the unordered
    # streaming partials match the oracle's sequential sum bit-for-bit
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    src = src.withColumn("value", F.col("value").cast("decimal(25,6)"))
    out = stream_aggregate(src, "sum", 86400, ts_col="ts", series_cols=["event_type"])
    with tempfile.TemporaryDirectory() as ck:
        q = (
            out.writeStream.format("memory")
            .queryName("stream_agg_contract")
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.sql(
        "select window_start, event_type, "
        "cast(agg_value as double) as value_sum "
        "from stream_agg_contract"
    )


# ---- metric value types / sampling modes / similarity tiers ---------------

def q_aggregate_set(spark, sf_dir):
    """MetricValue::Set per window/series: sorted distinct members."""
    from vector_spark.operators import aggregate_set

    e = _t(spark, sf_dir, "events").withColumn(
        "member", F.pmod(F.col("user_id"), F.lit(10)).cast("string")
    )
    out = aggregate_set(e, 86400, ts_col="ts", series_cols=["event_type"], value_col="member")
    return out.select(
        "window_start", "event_type",
        F.array_join("members", ",").alias("members_csv"), "set_size",
    )


def q_aggregate_histogram(spark, sf_dir):
    from vector_spark.operators import aggregate_histogram

    e = _t(spark, sf_dir, "events")
    return aggregate_histogram(
        e, buckets=[50.0, 100.0, 200.0], window_secs=86400 * 7,
        ts_col="ts", series_cols=["event_type"],
    )


def q_aggregate_summary(spark, sf_dir):
    from vector_spark.operators import aggregate_summary

    e = _t(spark, sf_dir, "events")
    return aggregate_summary(
        e, quantiles=[0.5, 0.9], window_secs=86400 * 7,
        ts_col="ts", series_cols=["event_type"],
    )


def q_aggregate_sketch(spark, sf_dir):
    """Real DDSketch mode (AgentDDSketch gamma-bucket analogue,
    metrics/ddsketch.rs): deterministic bucket keys + agent-style
    interpolated quantiles, so unlike approx_percentile this IS
    oracle-checkable — the DuckDB twin re-derives the same gamma-bucket
    math with window cumsums instead of a fold (independent formulation,
    same sketch)."""
    from vector_spark.operators import aggregate_sketch

    e = _t(spark, sf_dir, "events")
    return aggregate_sketch(
        e, quantiles=[0.5, 0.9], window_secs=86400 * 7,
        ts_col="ts", series_cols=["event_type"],
    )


def q_aggregate_summary_approx(spark, sf_dir):
    """Sketch-quantile summary (AgentDDSketch analogue, metric/value.rs
    Sketch): approx_percentile with accuracy 10k — mergeable bounded
    state, the 100 TB path. GK sketch values are engine-specific, so the
    oracle can't hash the quantile itself; instead this emits a BOUNDS
    VERDICT (VERDICT_r4 item 3): for each (window, series, phi) the
    EXACT rank interval of the operator's reported quantile is computed
    from the raw rows (a broadcast of the 50-row summary back onto the
    scan — verification plan, not the operator's scale path) and checked
    against the GK guarantee |rank - phi*n| <= ceil(n/accuracy), +1 rank
    for the phi*(n-1)-vs-phi*n target convention and +-5e-5 value
    tolerance for the operator's round(.,4). The oracle recomputes n and
    the DECIMAL-exact sum per group and asserts `within` = TRUE — if
    Spark's sketch ever left the bound the hash would mismatch."""
    from pyspark.sql.functions import broadcast

    from vector_spark.operators import aggregate_summary
    from vector_spark.operators.aggregate import tumbling_window

    acc = 10_000
    tol = 5e-5
    e = _t(spark, sf_dir, "events")
    s = aggregate_summary(
        e, quantiles=[0.5, 0.9], window_secs=86400 * 7,
        ts_col="ts", series_cols=["event_type"], approx=True, accuracy=acc,
    )
    qs = s.select(
        "window_start", "event_type",
        F.col("count").alias("n"), "sum",
        F.explode(F.map_from_arrays(
            F.array(F.lit(0.5), F.lit(0.9)),
            F.array(F.col("q0_5"), F.col("q0_9")),
        )).alias("phi", "qv"),
    )
    raw = e.select(
        tumbling_window(F.col("ts"), 86400 * 7).alias("window_start"),
        "event_type", "value",
    )
    j = raw.join(broadcast(qs), ["window_start", "event_type"])
    g = j.groupBy("window_start", "event_type", "phi", "n", "sum").agg(
        F.sum(F.when(F.col("value") < F.col("qv") - tol, 1)
              .otherwise(0)).alias("lo"),
        F.sum(F.when(F.col("value") <= F.col("qv") + tol, 1)
              .otherwise(0)).alias("hi"),
    )
    slack = F.ceil(F.col("n") / acc) + F.lit(1)
    target = F.col("phi") * F.col("n")
    within = ((F.col("lo") + 1 <= target + slack)
              & (F.col("hi") >= target - slack))
    return g.select(
        "window_start", "event_type", "phi", "n", "sum",
        within.alias("within"),
    )


def q_sample_group_modulo(spark, sf_dir):
    from vector_spark.operators import sample_group_modulo

    e = _t(spark, sf_dir, "events")
    return sample_group_modulo(e, 20, ["user_id"], "event_id").select(
        "event_id", "user_id", "sample_rate"
    )


def q_datadog_search(spark, sf_dir):
    """Condition::DatadogSearch subset: the translated query must match a
    hand-written SQL WHERE (src/conditions/mod.rs:23-37)."""
    from vector_spark.functions import datadog_search

    e = _t(spark, sf_dir, "events")
    cond = datadog_search(
        "event_type:(error OR signup) AND value:>50 -user_id:7", default_field="props"
    )
    return e.filter(cond).select("event_id", "event_type", "value", "user_id")


def q_reduce_ends_when(spark, sf_dir):
    """reduce with an ends_when condition: a purchase event closes its
    session (transaction-assembly semantics, reduce/transform.rs:241-262);
    the gap rule is disabled (huge gap) so only the marker splits."""
    e = _t(spark, sf_dir, "events")
    out = reduce_sessions(
        e,
        ["user_id"],
        {"n_events": ("count", "event_id"), "last_type": ("retain", "event_type")},
        ts_col="ts",
        gap_secs=10 * 365 * 86400,
        order_col=["ts", "event_id"],
        ends_when=F.col("event_type") == "purchase",
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("session_start_us"),
        "n_events",
        "last_type",
    )


def q_reduce_max_events(spark, sf_dir):
    """reduce with the max_events flush condition: sessions (2h gap) that
    accumulate 5 events flush early, splitting long runs into
    ceil(n/5)-sized chunks (reduce/config.rs:30-60)."""
    e = _t(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(25,6)")  # engine-exact sum
    )
    out = reduce_sessions(
        e, ["user_id"], {"v_sum": ("sum", "value_dec")},
        ts_col="ts", gap_secs=7200, order_col=["ts", "event_id"],
        max_events=5,
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("session_start_us"),
        F.col("events_merged").alias("n_events"),
        F.col("v_sum").cast("double").alias("v_sum"),
    )


def q_reduce_flush_period(spark, sf_dir):
    """reduce with the cyclic end_every_period flush: the gap rule is
    disabled (huge gap) so each user's whole history is one session, which
    flushes every 24h measured from the session's first event
    (reduce/config.rs end_every_period_ms)."""
    e = _t(spark, sf_dir, "events")
    out = reduce_sessions(
        e, ["user_id"], {"n_types": ("count", "event_type")},
        ts_col="ts", gap_secs=10 * 365 * 86400, order_col=["ts", "event_id"],
        end_every_secs=86400,
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("chunk_start_us"),
        F.col("events_merged").alias("n_events"),
    )


def q_find_table_records(spark, sf_dir):
    """find_enrichment_table_records multi-match semantics: a dup-keyed
    enrichment table fans matching events out 1->N; misses survive with
    null enrichment columns."""
    from vector_spark.operators import find_enrichment_table_records

    e = _t(spark, sf_dir, "events").select("event_id", "event_type")
    dim = spark.createDataFrame(
        [("error", "sev", "high"), ("error", "page", "oncall"), ("signup", "sev", "low")],
        "etype string, attr string, val string",
    )
    return find_enrichment_table_records(e, dim, [("event_type", "etype")])




def oracles() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["remap_parse_json"] = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       event_type || ':' || CAST(user_id AS VARCHAR) AS msg,
       CAST(floor(value / 50) AS BIGINT) AS value_bucket
FROM events
"""

    sql["filter_errors"] = """
SELECT event_id, user_id, event_type, value
FROM events WHERE event_type = 'error' AND value > 100
"""

    sql["route_multi"] = """
SELECT event_id, 'errors' AS route FROM events WHERE event_type = 'error'
UNION ALL
SELECT event_id, 'high_value' FROM events WHERE value > 150
UNION ALL
SELECT event_id, 'signup' FROM events WHERE event_type = 'signup'
UNION ALL
SELECT event_id, '_unmatched' FROM events
WHERE NOT (event_type = 'error') AND NOT (value > 150) AND NOT (event_type = 'signup')
"""

    sql["route_exclusive"] = """
SELECT event_id,
       CASE WHEN event_type = 'error' THEN 'errors'
            WHEN value > 150 THEN 'high_value'
            WHEN event_type = 'signup' THEN 'signup'
            ELSE '_unmatched' END AS route
FROM events
"""

    sql["dedupe_first"] = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1
"""

    sql["dedupe_lru"] = """
SELECT event_id FROM (
  SELECT event_id,
         lag(event_id) OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS prev
  FROM events
) WHERE prev IS NULL OR event_id - prev > 50
"""

    hv1 = _hexval_sql("substr(md5(CAST(event_id AS VARCHAR)), 1, 1)")
    hv2 = _hexval_sql("substr(md5(CAST(event_id AS VARCHAR)), 2, 1)")
    sql["sample_hash"] = f"""
SELECT event_id, 16 AS sample_rate FROM events
WHERE ({hv1} * 16 + {hv2}) % 16 = 0
"""

    sql["reduce_sessions"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, value, event_type, event_id FROM events
),
m AS (
  SELECT *,
         CASE WHEN lag(tus) OVER w IS NULL OR tus - lag(tus) OVER w > 3600000000
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS sess,
         row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS pos
  FROM m
)
SELECT user_id,
       min(tus) AS session_start_us,
       max(tus) AS session_end_us,
       CAST(count(*) AS BIGINT) AS events_merged,
       round(sum(value), 3) AS value_sum,
       min_by(event_type, pos) AS first_type,
       max_by(event_type, pos) AS last_type
FROM s GROUP BY user_id, sess
"""

    sql["aggregate_tumbling"] = f"""
SELECT (epoch_us(ts) // 86400000000) * 86400 AS window_start,
       event_type,
       count(*) AS events,
       {DSUM_SQL.format(col='value', alias='value_sum')},
       min(value) AS value_min,
       max(value) AS value_max
FROM events GROUP BY 1, 2
"""

    sql["aggregate_latest"] = """
SELECT (epoch_us(ts) // 86400000000) * 86400 AS window_start,
       event_type,
       max_by(value, event_id) AS latest_value
FROM events GROUP BY 1, 2
"""

    sql["aggregate_stdev"] = """
SELECT (epoch_us(ts) // 604800000000) * 604800 AS window_start,
       event_type,
       round(stddev_pop(value), 4) AS value_stdev
FROM events GROUP BY 1, 2
"""

    sql["aggregate_diff"] = f"""
WITH s AS (
  SELECT (epoch_us(ts) // 86400000000) * 86400 AS window_start,
         event_type,
         {DSUM_SQL.format(col='value', alias='s')}
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type,
       s - lag(s) OVER (PARTITION BY event_type ORDER BY window_start) AS diff_value
FROM s
"""

    sql["throttle"] = """
SELECT event_id FROM (
  SELECT event_id,
         row_number() OVER (
           PARTITION BY user_id, (epoch_us(ts) // 86400000000)
           ORDER BY event_id) AS rn
  FROM events
) WHERE rn <= 5
"""

    sql["log_to_metric"] = """
SELECT event_id, 'events_total' AS name, '' AS namespace, 'incremental' AS kind,
       'counter' AS metric_type, CAST(1.0 AS DOUBLE) AS value,
       CAST(NULL AS VARCHAR) AS statistic
FROM events
UNION ALL
SELECT event_id, 'purchase_value', '', 'incremental', 'counter', value, NULL
FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, 'user_gauge', '', 'absolute', 'gauge', CAST(user_id AS DOUBLE),
       NULL
FROM events
UNION ALL
SELECT event_id, 'latency_hist', '', 'incremental', 'distribution', value,
       'histogram'
FROM events
UNION ALL
SELECT event_id, 'latency_sum', '', 'incremental', 'distribution', value * 2,
       'summary'
FROM events WHERE event_type = 'view'
"""

    sql["log_to_metric_all"] = """
WITH b AS (
  SELECT event_id, round(value, 2) AS v, event_id % 7 AS m,
         'm' || CAST(event_id % 50 AS VARCHAR) AS name,
         CASE WHEN event_id % 2 = 0 THEN 'incremental'
              ELSE 'absolute' END AS kind,
         'ns' || CAST(user_id % 3 AS VARCHAR) AS namespace,
         'e' || CAST(user_id % 4 AS VARCHAR) AS tag_env,
         CASE WHEN user_id % 2 = 0 THEN 'histogram'
              ELSE 'summary' END AS stat,
         user_id AS uid, event_id AS eid
  FROM events
)
SELECT event_id, name, namespace, kind, 'counter' AS metric_type, tag_env,
       v AS value, CAST(NULL AS VARCHAR) AS set_csv, 0 AS n_samples,
       CAST(0.0 AS DOUBLE) AS sample_mass, CAST(NULL AS VARCHAR) AS statistic,
       0 AS n_buckets, 0 AS n_quantiles,
       CAST(NULL AS BIGINT) AS agg_count, CAST(NULL AS DOUBLE) AS agg_sum
FROM b WHERE m = 0
UNION ALL
SELECT event_id, name, namespace, kind, 'gauge', tag_env, v, NULL, 0, 0.0,
       NULL, 0, 0, NULL, NULL
FROM b WHERE m = 1
UNION ALL
SELECT event_id, name, namespace, kind, 'set', tag_env, NULL,
       's' || CAST(uid % 5 AS VARCHAR) || ',t' || CAST(eid % 9 AS VARCHAR),
       0, 0.0, NULL, 0, 0, NULL, NULL
FROM b WHERE m = 2
UNION ALL
SELECT event_id, name, namespace, kind, 'distribution', tag_env, NULL, NULL,
       2, round(v + v * 2 * (uid % 7 + 1), 4), stat, 0, 0, NULL, NULL
FROM b WHERE m = 3
UNION ALL
SELECT event_id, name, namespace, kind, 'histogram', tag_env, NULL, NULL,
       0, 0.0, NULL, 2, 0, eid % 100, round(v, 4)
FROM b WHERE m = 4
UNION ALL
SELECT event_id, name, namespace, kind, 'summary', tag_env, NULL, NULL,
       0, 0.0, NULL, 0, 2, eid % 100, round(v, 4)
FROM b WHERE m = 5
"""

    # the serializer is verified by exact inversion: same expected rows
    sql["metric_to_log_roundtrip"] = sql["log_to_metric_all"]

    sql["metric_to_log"] = """
SELECT event_id,
       'metric name=purchase_value kind=incremental value=' || printf('%.2f', value) AS message
FROM events WHERE event_type = 'purchase'
"""

    sql["tag_cardinality_limit"] = """
WITH firsts AS (
  SELECT event_type, min(event_id) AS f FROM events GROUP BY event_type
),
allowed AS (
  SELECT event_type FROM (
    SELECT event_type, row_number() OVER (ORDER BY f) AS r FROM firsts
  ) WHERE r <= 2
)
SELECT e.event_id,
       CASE WHEN a.event_type IS NOT NULL THEN e.event_type END AS event_type_lim
FROM events e LEFT JOIN allowed a USING (event_type)
"""

    sql["hash_replace"] = """
SELECT event_id,
       CASE WHEN row_number() OVER (PARTITION BY props ORDER BY event_id) = 1
            THEN props END AS props,
       md5(props) AS props_hash,
       CASE WHEN row_number() OVER (PARTITION BY event_type ORDER BY event_id) = 1
            THEN event_type END AS event_type,
       md5(event_type) AS event_type_hash
FROM events
"""

    sql["enrich_customer"] = """
SELECT e.event_id, c.c_name, n.n_name, r.r_name
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""

    sql["enrich_between"] = """
SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority
FROM lineitem l
LEFT JOIN orders o
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 90 DAY
"""

    # zip-unnest (parallel unnests zip in DuckDB) = pandas explode+cumcount
    sql["script_transform"] = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(len(string_split(text, ' ')))) AS word_idx
  FROM documents WHERE lang <> 'de'
)
SELECT doc_id, word_idx, length(word) AS word_len
FROM w WHERE word_idx < 5
"""

    # the reference's line_agg state machine (line_agg.rs:301-366)
    # transcribed as a recursive CTE stepping one line per key per
    # iteration — a sequential formulation, independent of the Spark
    # side's closed-form window derivation. continue_through: an occupied
    # buffer appends condition-matching lines; a non-matching line flushes
    # and is re-processed fresh (EndExclude), so seg advances whenever
    # NOT (open AND condition) and the open bit re-evaluates start.
    sql["multiline_stacktrace"] = r"""
WITH RECURSIVE src AS (
  SELECT user_id, event_id,
         CASE WHEN event_type = 'error'
              THEN 'ERROR evt ' || CAST(event_id AS VARCHAR)
              ELSE '  at frame_' || CAST(event_id % 7 AS VARCHAR) END AS line,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
),
flags AS (
  SELECT *, regexp_matches(line, '^ERROR') AS s, regexp_matches(line, '^\s') AS c
  FROM src
),
walk AS (
  SELECT user_id, event_id, rn, line, 1 AS seg, s AS open
  FROM flags WHERE rn = 1
  UNION ALL
  SELECT f.user_id, f.event_id, f.rn, f.line,
         CASE WHEN w.open AND f.c THEN w.seg ELSE w.seg + 1 END AS seg,
         CASE WHEN w.open AND f.c THEN TRUE ELSE f.s END AS open
  FROM walk w JOIN flags f ON f.user_id = w.user_id AND f.rn = w.rn + 1
)
SELECT user_id,
       string_agg(line, chr(10) ORDER BY rn) AS line,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id,
       COUNT(*) AS n_lines
FROM walk
GROUP BY user_id, seg
"""

    # halt_with: an occupied buffer appends every line and flushes AFTER a
    # condition-matching one (EndInclude); a vacant buffer consults only
    # start_pattern — the opener is never condition-checked
    # (line_agg.rs:349-365), which this walk reproduces exactly.
    sql["multiline_haltwith"] = r"""
WITH RECURSIVE src AS (
  SELECT user_id, event_id,
         'stmt ' || CAST(event_id % 13 AS VARCHAR)
           || CASE WHEN event_id % 5 = 0 THEN ';' ELSE '' END AS line,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
),
flags AS (
  SELECT *, regexp_matches(line, '^stmt') AS s, regexp_matches(line, ';$') AS c
  FROM src
),
walk AS (
  SELECT user_id, event_id, rn, line, 1 AS seg, s AS open
  FROM flags WHERE rn = 1
  UNION ALL
  SELECT f.user_id, f.event_id, f.rn, f.line,
         CASE WHEN w.open THEN w.seg ELSE w.seg + 1 END AS seg,
         CASE WHEN w.open THEN NOT f.c ELSE f.s END AS open
  FROM walk w JOIN flags f ON f.user_id = w.user_id AND f.rn = w.rn + 1
)
SELECT user_id,
       string_agg(line, chr(10) ORDER BY rn) AS line,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id,
       COUNT(*) AS n_lines
FROM walk
GROUP BY user_id, seg
"""

    # independent derivation: lead()-built validity intervals (the Spark
    # side builds the same intervals inside enrich_asof, but from the
    # operator's own window — this SQL re-derives them from scratch)
    sql["enrich_asof"] = """
WITH dim AS (
  SELECT o_orderkey,
         CAST(o_orderdate AS DATE) + v * 30 AS valid_from,
         o_orderpriority || '_v' || CAST(v AS VARCHAR) AS prio_version
  FROM orders, unnest([0, 1, 2]) AS t(v)
),
ivl AS (
  SELECT *, lead(valid_from) OVER (PARTITION BY o_orderkey
                                   ORDER BY valid_from) AS valid_to
  FROM dim
)
SELECT l.l_orderkey, l.l_linenumber, d.prio_version
FROM lineitem l
LEFT JOIN ivl d
  ON l.l_orderkey = d.o_orderkey
 AND l.l_shipdate >= d.valid_from
 AND (d.valid_to IS NULL OR l.l_shipdate < d.valid_to)
"""

    from vector_spark.sources import geoip_ranges

    geoip_values = ",\n  ".join(
        f"({lo}, {hi}, '{c}', '{r}')" for _, _, lo, hi, c, r in geoip_ranges()
    )
    sql["enrich_geoip"] = f"""
WITH t AS (
  SELECT event_id,
         user_id % 128 AS o2, event_id % 256 AS o3, (event_id * 7) % 256 AS o4
  FROM events
),
g(net_start, net_end, country, region) AS (VALUES
  {geoip_values}
)
SELECT t.event_id,
       printf('10.%d.%d.%d', o2, o3, o4) AS ip,
       g.country, g.region
FROM t
LEFT JOIN g
  ON 10 * 16777216 + o2 * 65536 + o3 * 256 + o4 BETWEEN g.net_start AND g.net_end
"""

    # the mmdb artifact roundtrip must be value-invisible: identical oracle
    sql["enrich_geoip_mmdb"] = sql["enrich_geoip"]

    g6 = ",\n  ".join(
        f"('{lo:032x}', '{hi:032x}', '{d['country']}', '{d['region']}')"
        for lo, hi, d in _geoip6_ranges()
    )
    sql["enrich_geoip6_mmdb"] = f"""
WITH g(s, e, country, region) AS (VALUES
  {g6}
),
t AS (SELECT event_id, user_id % 40 AS h, event_id % 65536 AS ee FROM events)
SELECT t.event_id,
       printf('2001:db8:%x::%x', h, ee) AS ip,
       g.country, g.region
FROM t
LEFT JOIN g
  ON printf('20010db8%04x0000000000000000%04x', h, ee) BETWEEN g.s AND g.e
"""

    sql["pipeline_events_e2e"] = f"""
WITH enriched AS (
  SELECT e.*, CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS k, r.r_name
  FROM events e
  LEFT JOIN customer c ON e.user_id = c.c_custkey
  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
  LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
),
routed AS (
  SELECT *,
         CASE WHEN event_type = 'error' THEN 'errors'
              WHEN event_type = 'purchase' THEN 'purchases'
              WHEN k >= 90 THEN 'high_k'
              ELSE '_unmatched' END AS route
  FROM enriched
)
SELECT route,
       (epoch_us(ts) // 604800000000) * 604800 AS window_start,
       coalesce(r_name, 'UNKNOWN') AS r_name,
       count(*) AS events,
       {DSUM_SQL.format(col='value', alias='value_sum')}
FROM routed GROUP BY 1, 2, 3
"""

    sql["reduce_merge_full"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, value, event_type, event_id FROM events
),
m AS (
  SELECT *,
         CASE WHEN lag(tus) OVER w IS NULL OR tus - lag(tus) OVER w > 7200000000
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS sess
  FROM m
)
SELECT user_id,
       min(tus) AS session_start_us,
       CAST(count(*) AS BIGINT) AS events_merged,
       string_agg(event_type, '|' ORDER BY tus, event_id) AS types_arr_joined,
       string_agg(event_type, ' ' ORDER BY tus, event_id) AS types_cat,
       string_agg(event_type, chr(10) ORDER BY tus, event_id) AS types_lines,
       round(min(value), 3) AS v_min,
       round(max(value), 3) AS v_max
FROM s GROUP BY user_id, sess
"""

    sql["topology_events"] = f"""
WITH tagged AS (
  SELECT *, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events
),
labeled AS (
  SELECT *,
         CASE WHEN event_type = 'error' THEN 'errors'
              WHEN event_type = 'purchase' THEN 'purchases'
              WHEN k >= 90 THEN 'high_k'
              ELSE '_unmatched' END AS route
  FROM tagged
)
SELECT route, count(*) AS events,
       {DSUM_SQL.format(col='value', alias='value_sum')}
FROM labeled GROUP BY route
"""

    sql["streaming_aggregate"] = f"""
SELECT (epoch_us(ts) // 86400000000) * 86400 AS window_start,
       event_type,
       {DSUM_SQL.format(col='value', alias='value_sum')}
FROM events GROUP BY 1, 2
"""

    sql["aggregate_set"] = """
SELECT (epoch_us(ts) // 86400000000) * 86400 AS window_start,
       event_type,
       array_to_string(list_sort(list_distinct(list(CAST(user_id % 10 AS VARCHAR)))), ',') AS members_csv,
       CAST(len(list_distinct(list(CAST(user_id % 10 AS VARCHAR)))) AS INTEGER) AS set_size
FROM events GROUP BY 1, 2
"""

    sql["aggregate_histogram"] = """
SELECT (epoch_us(ts) // 604800000000) * 604800 AS window_start,
       event_type,
       count(*) FILTER (value <= 50.0) AS le_50_0,
       count(*) FILTER (value <= 100.0) AS le_100_0,
       count(*) FILTER (value <= 200.0) AS le_200_0,
       count(value) AS count,
       CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum
FROM events GROUP BY 1, 2
"""

    sql["aggregate_summary"] = """
SELECT (epoch_us(ts) // 604800000000) * 604800 AS window_start,
       event_type,
       round(quantile_cont(value, 0.5), 4) AS q0_5,
       round(quantile_cont(value, 0.9), 4) AS q0_9,
       count(value) AS count,
       CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum
FROM events GROUP BY 1, 2
"""

    sql["aggregate_summary_approx"] = """
SELECT (epoch_us(ts) // 604800000000) * 604800 AS window_start,
       event_type,
       q.phi AS phi,
       count(value) AS n,
       CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum,
       TRUE AS within
FROM events CROSS JOIN (VALUES (0.5), (0.9)) q(phi)
GROUP BY 1, 2, 3
"""

    sql["aggregate_sketch"] = _aggregate_sketch_sql()

    sql["sample_group_modulo"] = """
SELECT event_id, user_id, 20 AS sample_rate FROM (
  SELECT event_id, user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
) WHERE (rn - 1) % 20 = 0
"""

    sql["datadog_search"] = """
SELECT event_id, event_type, value, user_id FROM events
WHERE event_type IN ('error', 'signup') AND value > 50 AND NOT user_id = 7
"""

    sql["reduce_ends_when"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_type, event_id FROM events
),
m AS (
  SELECT *,
         CASE WHEN lag(tus) OVER w IS NULL
                OR lag(event_type) OVER w = 'purchase'
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS sess,
         row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS pos
  FROM m
)
SELECT user_id,
       min(tus) AS session_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       max_by(event_type, pos) AS last_type
FROM s GROUP BY user_id, sess
"""

    sql["reduce_max_events"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, value, event_id FROM events
),
m AS (
  SELECT *,
         CASE WHEN lag(tus) OVER w IS NULL OR tus - lag(tus) OVER w > 7200000000
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
s AS (
  SELECT *, sum(brk) OVER w AS sess, row_number() OVER w AS rn
  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
t AS (
  SELECT *, last_value(CASE WHEN brk = 1 THEN rn END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY tus, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sub_start
  FROM s
)
SELECT user_id,
       min(tus) AS session_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v_sum
FROM t GROUP BY user_id, sess, (rn - sub_start) // 5
"""

    sql["reduce_flush_period"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_type, event_id FROM events
),
m AS (
  SELECT *, CASE WHEN lag(tus) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
s AS (
  SELECT *, sum(brk) OVER w AS sess,
         last_value(CASE WHEN brk = 1 THEN tus END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tus, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_start
  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
)
SELECT user_id,
       min(tus) AS chunk_start_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sess, (tus - sess_start) // 86400000000
"""

    sql["find_table_records"] = """
WITH dim(etype, attr, val) AS (
  VALUES ('error', 'sev', 'high'), ('error', 'page', 'oncall'), ('signup', 'sev', 'low')
)
SELECT e.event_id, e.event_type, dim.attr, dim.val
FROM events e LEFT JOIN dim ON dim.etype = e.event_type
"""

    # corpus report: same ROLLUP grouping sets, same whitespace token
    # model, md5-keyed distinct

    return sql


QUERIES = {
    "aggregate_diff": q_aggregate_diff,
    "aggregate_histogram": q_aggregate_histogram,
    "aggregate_latest": q_aggregate_latest,
    "aggregate_set": q_aggregate_set,
    "aggregate_sketch": q_aggregate_sketch,
    "aggregate_stdev": q_aggregate_stdev,
    "aggregate_summary": q_aggregate_summary,
    "aggregate_summary_approx": q_aggregate_summary_approx,
    "aggregate_tumbling": q_aggregate_tumbling,
    "datadog_search": q_datadog_search,
    "dedupe_first": q_dedupe_first,
    "dedupe_lru": q_dedupe_lru,
    "enrich_asof": q_enrich_asof,
    "script_transform": q_script_transform,
    "enrich_between": q_enrich_between,
    "enrich_customer": q_enrich_customer,
    "enrich_geoip": q_enrich_geoip,
    "enrich_geoip_mmdb": q_enrich_geoip_mmdb,
    "enrich_geoip6_mmdb": q_enrich_geoip6_mmdb,
    "filter_errors": q_filter_errors,
    "find_table_records": q_find_table_records,
    "hash_replace": q_hash_replace,
    "log_to_metric": q_log_to_metric,
    "log_to_metric_all": q_log_to_metric_all,
    "metric_to_log_roundtrip": q_metric_to_log_roundtrip,
    "metric_to_log": q_metric_to_log,
    "pipeline_events_e2e": q_pipeline_events_e2e,
    "reduce_ends_when": q_reduce_ends_when,
    "reduce_flush_period": q_reduce_flush_period,
    "reduce_max_events": q_reduce_max_events,
    "reduce_merge_full": q_reduce_merge_full,
    "reduce_sessions": q_reduce_sessions,
    "multiline_haltwith": q_multiline_haltwith,
    "multiline_stacktrace": q_multiline_stacktrace,
    "remap_parse_json": q_remap_parse_json,
    "route_exclusive": q_route_exclusive,
    "route_multi": q_route_multi,
    "sample_group_modulo": q_sample_group_modulo,
    "sample_hash": q_sample_hash,
    "streaming_aggregate": q_streaming_aggregate,
    "tag_cardinality_limit": q_tag_cardinality_limit,
    "throttle": q_throttle,
    "topology_events": q_topology_events,
}
