"""Driver contract for the spark-graft builder (PySpark target).

Every operator from SURVEY.md §2 that is implemented gets a `queries()`
entry (Spark, via vector_spark operators) and — where ANSI-SQL-expressible —
an `oracle_sql()` entry (DuckDB, same parquet views). Engine-portability
rules used throughout so the value-hash compare is exact:

  * no raw timestamps in outputs — epoch micros/seconds as BIGINT
    (unix_micros <-> epoch_us, both integer-exact);
  * float sums go through DECIMAL(25,6) (exact associative sum) and back to
    DOUBLE, so Spark's unordered partial aggregation and DuckDB's sequential
    sum produce bit-identical results;
  * hashes are md5-of-identical-strings (same hex in both engines);
  * every rank/top-k orders by (rounded value, unique id) — no float-order
    ambiguity;
  * aliases identical on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast

from vector_spark.operators import (
    dedupe,
    enrich_between,
    enrich_equi,
    exclusive_route,
    filter_events,
    hash_replace,
    log_to_metric,
    metric_to_log,
    reduce_sessions,
    sample,
    tag_cardinality_limit,
    throttle,
)
from vector_spark.operators.aggregate import aggregate_metrics, tumbling_window
from vector_spark.operators.log_to_metric import MetricSpec
from vector_spark.operators.route import routed_union
from vector_spark.datapipe import (
    binary_meta,
    cosine_topk,
    doc_fingerprint,
    exact_dedup,
    langid,
    lsh_ann_topk,
    minhash_lsh_pairs,
    simhash,
    text_quality,
    token_count,
)
from vector_spark.sources import generate_pages, geo_dim, lang_dim
from vector_spark.plans import pages_pipeline


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver may run these on its own session: pin the tz-sensitive
    # confs (unix_timestamp over NTZ values, decode of raw bytes) so
    # results match the tz-agnostic DuckDB oracles regardless of host tz
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(col, alias: str):
    """Engine-exact float sum: per-row cast to DECIMAL(25,6) (deterministic
    rounding of the double), exact decimal sum, cast back to double."""
    return F.sum(col.cast("decimal(25,6)")).cast("double").alias(alias)


DSUM_SQL = "CAST(sum(CAST({col} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"

ROUTES = {
    "errors": "event_type = 'error'",
    "high_value": "value > 150",
    "signup": "event_type = 'signup'",
}


# --------------------------------------------------------------------------
# query implementations (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

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
    e = _t(spark, sf_dir, "events")
    return log_to_metric(
        e,
        [
            MetricSpec("counter", "events_total"),
            MetricSpec("counter", "purchase_value", value=F.col("value"),
                       when=F.col("event_type") == "purchase"),
            MetricSpec("gauge", "user_gauge", value=F.col("user_id").cast("double")),
        ],
        carry=["event_id"],
    )


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


def q_tpch_q1(spark, sf_dir):
    from vector_spark.session import ensure_parallelism

    li = ensure_parallelism(_t(spark, sf_dir, "lineitem"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    from vector_spark.session import ensure_parallelism

    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = ensure_parallelism(_t(spark, sf_dir, "lineitem"))
    revenue = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    return revenue.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


# ---- training-data ops ----------------------------------------------------

def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): five-way join with broadcast dims,
    hash agg, deterministic ordering — the relational-depth probe for the
    §2.9 checklist. Customer and supplier must share the nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    out = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), (o.o_custkey == c.c_custkey))
        .join(broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            ).alias("_r")
        )
    )
    # decimal-domain round: .xx5 ties round HALF_UP in both engines
    return out.select("n_name", F.round(F.col("_r"), 2).cast("double").alias("revenue"))


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure scan + filter + one
    global agg — the predicate-pushdown probe."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(25,6)")
        ).alias("_r")
    )
    return out.select(F.round(F.col("_r"), 2).cast("double").alias("revenue"))


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customer): agg-derived semi-join set
    (HAVING sum > 200), three-way join with a broadcast customer dim,
    re-aggregation, deterministic top-100 (totalprice desc, date,
    orderkey tie-break) — the agg-in-subquery + top-k shape q1/q3/q5/q6
    don't cover."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("_q"))
        .filter(F.col("_q") > 200)
        .select(F.col("l_orderkey").alias("_big_ok"))
    )
    out = (
        o.join(big, o["o_orderkey"] == big["_big_ok"]).drop("_big_ok")
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity"), "sum_qty"))
        .orderBy(
            F.desc("o_totalprice"), F.col("o_orderdate"), F.col("o_orderkey")
        )
        .limit(100)
    )
    return out.select(
        "c_name", "c_custkey", "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "sum_qty",
    )


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): LEFT SEMI join — orders in
    a quarter having at least one late lineitem. The testdata schema lacks
    l_commitdate/l_receiptdate, so "late" is adapted to
    l_shipdate > o_orderdate; the shape (EXISTS -> LeftSemi, correlated
    non-equi residual on the join) is the point. The lineitem side carries
    only (l_orderkey, l_shipdate) through the join — ids-only at 100 TB."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    late = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (o.o_orderkey == late.l_orderkey) & (late.l_shipdate > o.o_orderdate),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): LEFT OUTER join customer->orders
    (keeping order-less customers as count 0) with a join-side predicate,
    then a second aggregation over the counts — the outer-join +
    agg-of-agg shape. count("o_orderkey") counts matched rows only, the
    standard q13 trick."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): LEFT ANTI join
    (NOT IN excluded suppliers) + COUNT DISTINCT per part group. Adapted to
    the trimmed schema: the part-supplier relationship comes from lineitem
    (no partsupp table) and the supplier exclusion is s_acctbal < 2000 (no
    s_comment). Both dims broadcast; lineitem carries only
    (l_partkey, l_suppkey) through the shuffle."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").startswith("PROMO"))
        & F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 2000).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): scalar subquery (global
    avg of positive balances, broadcast as a 1-row cross join) + LEFT ANTI
    correlated NOT EXISTS. Adapted: cntrycode := c_nationkey (no c_phone)
    and the anti-join excludes customers with any URGENT order (every
    customer has orders in the testdata). Threshold = exact decimal sum /
    count in double — bit-identical in both engines."""
    c = _t(spark, sf_dir, "customer")
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("t")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("t"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"), _dsum(F.col("c_acctbal"), "totacctbal"))
    )


def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): correlated extremum subquery.
    Adapted to the trimmed schema: the part-supplier relation comes from
    DISTINCT lineitem pairs (no partsupp), the correlated extremum is
    max(s_acctbal) per part (no ps_supplycost), parts are p_type='ECONOMY'
    and suppliers sit in region EUROPE. Everything but lineitem is
    broadcast; lineitem contributes only its distinct (partkey, suppkey)
    pairs. Deterministic top-100 with full tie-breaks."""
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(broadcast(p), ps.l_partkey == p.p_partkey)
        .join(broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_type", "s_name", "n_name", "s_acctbal")
    )
    best = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.max("s_acctbal").alias("_best")
    )
    return (
        cand.join(
            broadcast(best),
            (cand.p_partkey == best._pk) & (cand.s_acctbal == best._best),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): two nation-dim joins on different keys
    (supplier nation vs customer nation) with a symmetric nation-pair
    predicate, yearly revenue rollup. NATION_15/NATION_19 replace
    FRANCE/GERMANY. Both nation dims broadcast under distinct aliases."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_15") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("_snk"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("_cnk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        # round in the DECIMAL domain (HALF_UP both engines) — round(double)
        # resolves .xx5 ties differently in Spark vs DuckDB
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            ).alias("_r")
        )
        .select(
            "supp_nation", "cust_nation", "l_year",
            F.round(F.col("_r"), 2).cast("double").alias("revenue"),
        )
    )


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): conditional-aggregate ratio —
    share of NATION_21-supplied revenue among AMERICA-region customers for
    ECONOMY parts, per order year. Both sums are exact decimal sums cast
    to double, so the ratio is the same IEEE division in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    ncust = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nsupp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(ncust), F.col("c_nationkey") == ncust.n_nationkey)
        .join(broadcast(r), ncust.n_regionkey == r.r_regionkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(nsupp), F.col("s_nationkey") == F.col("_snk"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            _dsum(F.when(F.col("supp_nation") == "NATION_21", vol).otherwise(0.0), "_nat"),
            _dsum(vol, "_tot"),
        )
        .select(
            "o_year", F.round(F.col("_nat") / F.col("_tot"), 6).alias("mkt_share")
        )
    )


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit): LIKE-filtered part dim fanned across
    every supplier nation and order year. Adapted: profit =
    revenue − 0.1·p_retailprice·l_quantity (no ps_supplycost); parts are
    '%widget%'. The profit expression is one IEEE double per row, cast to
    DECIMAL(25,6) before the sum on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    n = _t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit.cast("decimal(25,6)")).alias("_p"))
        # 2-dp rounding happens in the DECIMAL domain (HALF_UP in both
        # engines: Spark round-on-decimal == DuckDB round-on-decimal),
        # never on the double — round(double, 2) resolves .xx5 ties by
        # decimal-string in Spark but by binary value in DuckDB.
        .select(
            "nation", "o_year",
            F.round(F.col("_p"), 2).cast("double").alias("sum_profit"),
        )
    )


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): quarter of orders × returned
    lineitems, grouped per customer with the nation dim, deterministic
    top-20 by unrounded revenue (identical doubles in both engines) with a
    c_custkey tie-break."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            ).alias("_rev")
        )
        .orderBy(F.desc("_rev"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey", "c_name",
            F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
            "c_acctbal", "n_name",
        )
    )


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock): per-part value with a HAVING threshold
    that is a scalar subquery over the SAME filtered set (broadcast 1-row
    cross join). Adapted: value = revenue shipped by EUROPE-region
    suppliers (no partsupp); threshold = 1.3x the mean per-part value
    (total / distinct parts — scale-free, unlike TPC-H's 0.0001/SF
    fraction, so the query keeps selecting rows at every SF). Both sides
    of the comparison are decimal-sum doubles scaled by the same
    literal."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    base = (
        li.join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_v"),
        )
    )
    per_part = base.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        F.sum(F.col("_v").cast("decimal(25,6)")).alias("_val")
    )
    total = base.agg(
        _dsum(F.col("_v"), "_tot"),
        F.countDistinct("l_partkey").alias("_np"),
    )
    return (
        per_part.join(broadcast(total))
        .filter(
            F.col("_val").cast("double") > F.lit(1.3) * F.col("_tot") / F.col("_np")
        )
        .select("ps_partkey", F.round(F.col("_val"), 2).cast("double").alias("value"))
    )


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping modes / priority): join + dual conditional
    counts. Adapted: l_returnflag stands in for l_shipmode and "late" is
    l_shipdate > o_orderdate (no commit/receipt dates); counts split by
    URGENT/HIGH vs the rest, FILTER-style on both engines (BIGINT)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional-revenue ratio over a
    two-month ship window — 100·PROMO revenue / total revenue, both exact
    decimal sums cast to double before one IEEE division."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-03-01")
    )
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            _dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0), "_promo"),
            _dsum(vol, "_tot"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("_promo") / F.col("_tot"), 6).alias(
                "promo_revenue"
            )
        )
    )


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): revenue-per-supplier view over a quarter,
    filtered to the max via a broadcast 1-row scalar subquery — the
    equality is on unrounded decimal-sum doubles, identical in both
    engines, so ties (all qualifying suppliers) surface in both."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("_sk")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)")
        ).alias("_rev")
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    return (
        rev.join(broadcast(mx))
        .filter(F.col("_rev") == F.col("_mx"))
        .join(broadcast(s), F.col("_sk") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("_rev"), 2).cast("double").alias("total_revenue"),
        )
    )


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): correlated per-part AVG
    threshold — lineitems under 20% of their part's mean quantity, summed
    and divided by 7. Adapted part filter: Brand#13 MEDIUM (no
    p_container). The per-part average is an exact decimal sum / count in
    double; the 0.2 scaling is the same IEEE multiply on both engines."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "MEDIUM")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    return (
        li.join(broadcast(avg_q), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("_avg"))
        .agg(_dsum(F.col("l_extendedprice"), "_s"))
        .select((F.round(F.col("_s") / 7.0, 2)).alias("avg_yearly"))
    )


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): disjunction-of-conjunctions
    predicate spanning both join sides — the OR-of-ANDs pushdown probe.
    Adapted: p_size bands replace p_container/shipmode."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        j.filter(cond)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            ).alias("_r")
        )
        .select(F.round(F.col("_r"), 2).cast("double").alias("revenue"))
    )


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion): double-nested semi-join —
    EUROPE suppliers whose 1996 shipped quantity of any 'small%' part
    exceeds 30% of that part's total (correlated aggregate threshold; no
    ps_availqty). Candidate supplier ids are distinct before the final
    semi-join, so the shuffle carries ids only."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey", "l_partkey", "l_quantity")
    )
    per_sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double").alias("_sq")
    )
    per_p = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double").alias("_tq")
    )
    cand = (
        per_sp.join(broadcast(per_p), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("_sq") > F.lit(0.3) * F.col("_tq"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(cand, s.s_suppkey == cand.l_suppkey, "leftsemi")
        .select("s_name", "s_acctbal")
    )


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): the EXISTS +
    NOT-EXISTS self-join pair on lineitem — multi-supplier 'F' orders
    where ONLY this supplier was late. Adapted: late means shipped >30
    days after o_orderdate (no receipt/commit dates); supplier scope is
    region EUROPE. The order join happens once; both the semi and the
    anti side reuse the same (orderkey, suppkey, late) projection, so the
    self-joins carry three columns."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lo = (
        _t(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ).alias("_late"),
        )
    )
    l1 = lo.filter(F.col("_late"))
    l2 = lo.select(F.col("l_orderkey").alias("_k2"), F.col("l_suppkey").alias("_s2"))
    l3 = lo.filter(F.col("_late")).select(
        F.col("l_orderkey").alias("_k3"), F.col("l_suppkey").alias("_s3")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("_k2")) & (F.col("l_suppkey") != F.col("_s2")),
            "leftsemi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("_k3")) & (F.col("l_suppkey") != F.col("_s3")),
            "leftanti",
        )
    )
    return (
        waiting.join(broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def q_dedup_exact_text(spark, sf_dir):
    return exact_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_minhash_lsh(spark, sf_dir):
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


def q_dedup_clusters(spark, sf_dir):
    """Near-duplicate cluster ids: MinHash-LSH verified pairs -> distributed
    connected components (min-label propagation + pointer jumping, O(log
    diameter) rounds). cluster_id = min doc_id per component; the oracle is
    an independent recursive-CTE transitive closure over the same pairs."""
    from vector_spark.datapipe import dedup_clusters

    return dedup_clusters(_t(spark, sf_dir, "documents"), jaccard_threshold=0.5)


def q_dedup_ladder(spark, sf_dir):
    """Composed dedup ladder: exact tier (min id per md5) then MinHash-LSH
    near-dup tier (remove the higher id of every verified pair) — one
    surviving doc per duplicate neighborhood with the exact-tier dup_count."""
    from vector_spark.datapipe import dedup_ladder

    return dedup_ladder(_t(spark, sf_dir, "documents"), jaccard_threshold=0.5)


def q_dedup_simhash(spark, sf_dir):
    return simhash(_t(spark, sf_dir, "documents"))


def q_pii_scrub(spark, sf_dir):
    """PII sweep over a deterministic synthetic PII-bearing column (the
    testdata carries no PII, so the query plants emails / IPs / SSNs
    derived from doc_id with IDENTICAL expressions on both engines, then
    counts + redacts them)."""
    from vector_spark.datapipe import pii_scrub

    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.lit("reach u"), F.col("doc_id").cast("string"),
            F.lit("@mail"), (F.col("doc_id") % 7).cast("string"), F.lit(".com from 10."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
            (F.col("doc_id") % 100).cast("string"), F.lit(" "),
            F.when(F.col("doc_id") % 3 == 0, F.lit("ssn 123-45-6789 ")).otherwise(F.lit("")),
            F.col("text"),
        ).alias("text"),
    )
    return pii_scrub(planted)


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-stratum quota: 5 docs per (lang, source)
    stratum, md5-rank selection with id tie-break (stratum sizes in the
    testdata run 1-16, so the quota genuinely cuts)."""
    from vector_spark.datapipe import sample_stratified

    return sample_stratified(
        _t(spark, sf_dir, "documents"), ["lang", "source"], 5
    ).select("doc_id", "lang", "source")


_BP_NAV = '<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>'
_BP_LEAD = (
    "the quick summary of it is that this page was written for you and "
    "we have put it on the web as the content you are here for "
)
_BP_TAIL = (
    '<p>Read more</p><div>Copyright 2020 <a href="/t">Terms</a> '
    '<a href="/p">Privacy</a><script>var x = 1;</script></div>'
)


def q_boilerplate_blocks(spark, sf_dir):
    """jusText-style boilerplate classification over deterministically
    planted page markup: a link-farm nav (bad), a stopword-dense lead +
    doc text content block (good/near_good/bad varies with doc length —
    the density dilutes), a short 'Read more' (context-inherited), and a
    copyright/link footer with an embedded script (dropped). The oracle
    replays the page build and the whole chain from boilerplate.py's
    pattern constants."""
    from vector_spark.datapipe import boilerplate_blocks

    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(_BP_NAV + "<p>" + _BP_LEAD),
        F.col("text"),
        F.lit(" &amp; more</p>" + _BP_TAIL),
    )
    return boilerplate_blocks(d.select("doc_id", html.alias("html")))


def q_quality_classifier(spark, sf_dir):
    """fastText-style hashed-ngram linear quality classifier (GPT-3 appendix
    A's curation gate as inference): deterministic synthetic model —
    weight(bucket) = u32(md5('w|'||bucket)) % 2001 / 1000 - 1, an exactly
    representable grid so both engines hold identical doubles — broadcast
    to the exploded unigram+bigram features, DECIMAL-exact mean, sigmoid."""
    from vector_spark.datapipe import quality_classifier

    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit("w|"), F.col("id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    wdf = spark.range(4096).select(
        F.col("id").alias("bucket"),
        ((u32 % 2001).cast("double") / F.lit(1000.0) - F.lit(1.0)).alias("weight"),
    )
    return quality_classifier(_t(spark, sf_dir, "documents"), wdf, threshold=0.5)


def q_corpus_build(spark, sf_dir):
    """Composed end-to-end corpus build: exact dedup -> fastText-style
    classifier gate (the q_quality_classifier synthetic model) -> per-lang
    token-budget mixture -> 64-token sequence packing. Ids-only semi-joins
    between stages; the oracle re-roots each stage's SQL onto the previous
    survivors."""
    from vector_spark.datapipe import corpus_build

    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit("w|"), F.col("id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    wdf = spark.range(4096).select(
        F.col("id").alias("bucket"),
        ((u32 % 2001).cast("double") / F.lit(1000.0) - F.lit(1.0)).alias("weight"),
    )
    return corpus_build(
        _t(spark, sf_dir, "documents"),
        wdf,
        budgets={"en": 3000, "de": 1200, "es": 1500, "fr": 1500, "zh": 1500},
        seq_len=64,
    )


def q_pack_sequences(spark, sf_dir):
    """GPT-style concatenate-and-chunk sequence packing: the corpus in
    shuffle_corpus order (seed 42, 8 shards), token stream chunked into
    64-token training sequences, one row per doc-x-sequence overlap with
    exact slice offsets. Pure integer arithmetic -> hash-exact oracle."""
    from vector_spark.datapipe import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), seq_len=64)


def q_mixture_sample(spark, sf_dir):
    """Token-budget mixture sampling: per-lang budgets cut the corpus in a
    seed-deterministic md5 order via a hierarchical (bucketed) prefix sum —
    only the boundary bucket per group pays a fine-grained sort. en is cut
    deep, zh nearly zeroed, fr omitted (dropped); the oracle replays the
    same draw with a naive running-sum window."""
    from vector_spark.datapipe import mixture_sample

    return mixture_sample(
        _t(spark, sf_dir, "documents"),
        budgets={"en": 4000, "de": 1500, "es": 2000, "zh": 100},
    )


def q_perplexity_bucket(spark, sf_dir):
    """CCNet-style LM quality scoring (unigram analogue, disclosed in
    lm.py): self-trained token counts, Laplace log10-probs, per-doc mean
    NLL, head/middle/tail buckets. Thresholds are the sf0.01 terciles so
    the bucket column genuinely three-ways the corpus at driver scale."""
    from vector_spark.datapipe import perplexity_score

    return perplexity_score(
        _t(spark, sf_dir, "documents"), head=1.4765, middle=1.4784
    )


def q_dsir_resample(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023): target unigram LM
    self-trained on the doc_id%7==0 "curated" slice, source LM on the full
    corpus, per-doc log importance ratio, then Gumbel-top-k (k=200, T=2.0)
    with md5-seeded uniforms — both engines draw the identical sample at
    any parallelism. Oracle replays counts, 6-dp DECIMAL term sums, and
    the Gumbel key exactly."""
    from vector_spark.datapipe import importance_resample, unigram_lm

    d = _t(spark, sf_dir, "documents")
    target = unigram_lm(d.filter(F.col("doc_id") % 7 == 0))
    return importance_resample(d, 200, target, temperature=2.0)


def q_html_text(spark, sf_dir):
    """C4-style HTML -> text extraction over deterministically planted
    page markup (title/style/script/comments/entities/block structure
    wrapped around documents.text with IDENTICAL concat expressions on
    both engines). The oracle replays the exact regex chain — generated
    from vector_spark.datapipe.html's pattern constants, so the two
    engines cannot drift."""
    from vector_spark.datapipe import extract_html_text

    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><style>p {color: red}</style>"
            "<script>var t = 1 < 2;</script></head>"
            "<body><!-- crawler metadata -->"
            "<h1>Doc&nbsp;"
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><div>tail &amp;lt; end</div></body></html>"),
    )
    return extract_html_text(
        d.select("doc_id", html.alias("html")), id_cols=("doc_id",)
    )


def q_codec_warc(spark, sf_dir):
    """WARC (ISO 28500) framing + record parse: each events row becomes a
    two-record WARC stream (response carrying props as the payload,
    metadata carrying event_type), framed by Content-Length byte counts
    and parsed back field-exact. The oracle reconstructs the expected
    records directly from the source columns (the codec_framing_octet
    pattern)."""
    from vector_spark.functions import frame_warc, parse_warc_record

    e = _t(spark, sf_dir, "events")
    date_str = F.date_format(
        F.date_trunc("second", F.col("ts").cast("timestamp")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )
    buf = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://crawl.example/"),
        F.col("event_id").cast("string"),
        F.lit("\r\nWARC-Date: "),
        date_str,
        F.lit("\r\nWARC-Record-ID: <urn:uuid:id-"),
        F.col("event_id").cast("string"),
        F.lit(">\r\nContent-Type: application/json\r\nContent-Length: "),
        F.octet_length("props").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("props"),
        F.lit("\r\n\r\nWARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: "),
        F.octet_length("event_type").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("event_type"),
        F.lit("\r\n\r\n"),
    )
    recs = e.select(
        "event_id", F.posexplode(frame_warc(buf)).alias("idx", "rec")
    )
    return recs.select(
        "event_id",
        "idx",
        parse_warc_record(F.col("rec")).alias("w"),
    ).select(
        "event_id",
        "idx",
        F.col("w.warc_type").alias("warc_type"),
        F.col("w.target_uri").alias("target_uri"),
        F.unix_micros(F.col("w.warc_date")).alias("warc_date_us"),
        F.col("w.record_id").alias("record_id"),
        F.col("w.content_type").alias("content_type"),
        F.col("w.content_length").alias("content_length"),
        F.col("w.payload").alias("payload"),
    )


def q_crawl_pipeline(spark, sf_dir):
    """Crawl -> corpus topology over WET-style WARC buffers built from
    documents (one 'conversion' record per doc, Content-Length =
    byte-exact): frame -> parse -> fused Gopher-quality + langid gates ->
    exclusive route (rejected_quality | rejected_lang | corpus). The
    oracle composes the quality_gopher and langid SQL fragments over the
    same documents — the WARC trip must be lossless for the row hashes to
    meet. Thresholds match the quality_gopher contract (20 words, 1
    stopword)."""
    from vector_spark.plans import crawl_pipeline

    d = _t(spark, sf_dir, "documents")
    buf = F.concat(
        F.lit(
            "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://crawl.example/"
        ),
        F.col("doc_id").cast("string"),
        F.lit("\r\nWARC-Date: 2024-05-01T00:00:00Z\r\nContent-Length: "),
        F.octet_length("text").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("text"),
        F.lit("\r\n\r\n"),
    )
    out = crawl_pipeline(
        d.select(buf.alias("buf")),
        quality={"min_words": 20, "min_stopword_hits": 1},
    )["curated"]
    return out.select(
        F.regexp_extract("target_uri", r"(\d+)$", 1).cast("long").alias("doc_id"),
        "content_length",
        "n_words",
        "predicted_lang",
        "route",
    )


def q_url_filter(spark, sf_dir):
    """C4-style URL pass over deterministically planted crawl URLs
    (upper/lower-cased schemes and hosts, default and non-default ports,
    utm/gclid tracking params, fragments, bare-slash paths, .co.uk
    registrable domains; consecutive doc pairs collide after
    normalization 1/3 of the time so is_canonical genuinely cuts). The
    Spark side parses the ASSEMBLED url with parse_url; the oracle
    recomputes the normalization from the component columns — opposite
    formulations on purpose."""
    from vector_spark.datapipe import url_filter

    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.expr(
            """
            concat(
              CASE WHEN doc_id % 5 = 0
                   THEN upper(CASE WHEN (doc_id div 2) % 3 = 0 THEN 'https' ELSE 'http' END)
                   ELSE CASE WHEN (doc_id div 2) % 3 = 0 THEN 'https' ELSE 'http' END END,
              '://',
              CASE WHEN doc_id % 2 = 0
                   THEN upper(concat('www.site', CAST((doc_id div 2) % 13 AS STRING),
                        CASE WHEN (doc_id div 2) % 4 = 0 THEN '.co.uk' ELSE '.com' END))
                   ELSE concat('www.site', CAST((doc_id div 2) % 13 AS STRING),
                        CASE WHEN (doc_id div 2) % 4 = 0 THEN '.co.uk' ELSE '.com' END) END,
              CASE WHEN doc_id % 2 = 1
                   THEN CASE WHEN (doc_id div 2) % 3 = 0 THEN ':443' ELSE ':80' END
                   WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END,
              CASE WHEN (doc_id div 2) % 5 = 0 THEN '/'
                   ELSE concat('/p/', CAST((doc_id div 2) % 9 AS STRING)) END,
              CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1'
                   WHEN doc_id % 3 = 1 THEN '?b=2&a=1&gclid=x'
                   ELSE '' END,
              CASE WHEN doc_id % 2 = 1 THEN concat('#sec', CAST(doc_id % 4 AS STRING)) ELSE '' END
            )"""
        ).alias("url"),
    )
    block = spark.createDataFrame([("site3.com",), ("site7.co.uk",)], "domain string")
    return url_filter(planted, block)


def q_decontaminate(spark, sf_dir):
    """GPT-3-style benchmark decontamination: docs sharing any word
    n-gram with the held-out set are dropped. The synthetic benchmark is
    every 101st doc (deterministic, ~1% like a real eval suite); n=4
    instead of the published 13 because the testdata docs are ~25-word
    synthetic lines — at sf0.01 this flags ~11 genuinely-overlapping
    non-benchmark docs, so the oracle checks real discrimination, not a
    constant column."""
    from vector_spark.datapipe import decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 101 == 7)
    return decontaminate(d, bench, n=4)


def q_shuffle_corpus(spark, sf_dir):
    """Deterministic global corpus shuffle into 8 shards, seed 42 —
    (shard, pos) must be identical for any input partitioning (the
    resume/reproducibility invariant); the oracle recomputes the same
    md5-derived shard + rank in SQL."""
    from vector_spark.datapipe import shuffle_corpus

    return shuffle_corpus(
        _t(spark, sf_dir, "documents"),
        n_shards=8,
        seed=42,
        payload_cols=["text", "lang", "source", "n_chars"],
    )


def q_curation_pipeline(spark, sf_dir):
    """The composed curation recipe as ONE plan: Gopher quality gates
    (contract thresholds) -> repetition gates -> corpus-wide span dedup
    over the gated set -> langid, with the three row-local stages fused
    into a single scan projection."""
    from vector_spark.datapipe import curation_pipeline

    return curation_pipeline(
        _t(spark, sf_dir, "documents"),
        quality={"min_words": 20, "min_stopword_hits": 1},
        span_words=3,
        max_removed_frac=0.5,
    )


def q_chunk_documents(spark, sf_dir):
    """Context-window packing prep: 8-token chunks with 2-token overlap
    (stride 6) over the documents table — one posexplode, no shuffle."""
    from vector_spark.datapipe import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"), chunk_tokens=8, overlap=2)


def q_quality_repetition(spark, sf_dir):
    """Gopher repetition rules (Rae et al. Table A1): top-2/3/4-gram char
    fraction + duplicated-5..10-gram char fraction, per-rule flags + keep.
    Spark computes each rule as an in-row sorted-run fold (scan-speed, no
    shuffle); the oracle is the opposite unnest->GROUP BY formulation."""
    from vector_spark.datapipe import repetition_filter_gopher

    return repetition_filter_gopher(_t(spark, sf_dir, "documents"))


def q_dedup_spans(spark, sf_dir):
    """C4/RefinedWeb-style cross-document span dedup: 3-word blocks, first
    occurrence (doc_id, span_no) survives, documents reassembled in order.
    The testdata documents are single-line word streams, so the word-block
    unit (not newline lines) is the discriminative one here."""
    from vector_spark.datapipe import dedup_spans

    return dedup_spans(_t(spark, sf_dir, "documents"), span_words=3)


def q_quality_gopher(spark, sf_dir):
    """Gopher-rule quality gates over documents (min_words lowered to suit
    the synthetic docs' lengths)."""
    from vector_spark.datapipe import quality_filter_gopher

    return quality_filter_gopher(
        _t(spark, sf_dir, "documents"), min_words=20, min_stopword_hits=1
    )


def q_text_quality(spark, sf_dir):
    return text_quality(_t(spark, sf_dir, "documents"))


def q_token_count(spark, sf_dir):
    return token_count(_t(spark, sf_dir, "documents"))


def q_doc_fingerprint(spark, sf_dir):
    return doc_fingerprint(_t(spark, sf_dir, "documents"))


def q_langid(spark, sf_dir):
    return langid(_t(spark, sf_dir, "documents"))


def q_cosine_topk(spark, sf_dir):
    return cosine_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5
    ).withColumn("rank", F.col("rank").cast("long"))


def q_ann_lsh(spark, sf_dir):
    # oracle-checked: hyperplanes are plan-time md5 +/-1 literals shared
    # verbatim with the SQL oracle (see _ann_lsh_sql)
    return lsh_ann_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5
    ).withColumn("rank", F.col("rank").cast("long"))


def q_multimodal_meta(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").withColumn("payload", F.encode("text", "UTF-8"))
    return binary_meta(d, "payload", "doc_id")


def q_pages_pipeline(spark, sf_dir):
    # rows-only check: input is the deterministic generated pages table
    # (north-rule input shape), not a testdata parquet
    pages = generate_pages(spark, 20_000, partitions=8)
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))
    return out["sink_counts"]


# ---- VRL function surface -------------------------------------------------

def q_vrl_parse_syslog(spark, sf_dir):
    """Round-trip: build RFC3164 lines from event columns, parse them back.
    The oracle computes the expected fields directly from the columns, so a
    parse bug cannot cancel out."""
    from vector_spark.functions import parse_syslog

    e = _t(spark, sf_dir, "events")
    line = F.format_string(
        "<%d>Oct 11 22:14:15 host%d app%d[%d]: event %s",
        (F.col("event_id") % 192).cast("int"),
        F.col("user_id"),
        (F.col("user_id") % 7).cast("int"),
        F.col("event_id"),
        F.col("event_type"),
    )
    parsed = parse_syslog(line)
    return e.select(
        "event_id",
        parsed["facility"].alias("facility"),
        parsed["severity"].alias("severity"),
        parsed["hostname"].alias("hostname"),
        parsed["appname"].alias("appname"),
        parsed["procid"].cast("long").alias("procid"),
        parsed["message"].alias("message"),
    )


def q_vrl_parse_grok(spark, sf_dir):
    """Grok parse of synthesized access-log lines (%{IP} %{WORD} %{URIPATH}
    %{NUMBER}); oracle constructs expected fields directly."""
    from vector_spark.functions import parse_grok

    e = _t(spark, sf_dir, "events")
    line = F.format_string(
        "10.0.%d.%d GET_%s /api/u%d %d.5 trailing",
        (F.col("user_id") % 256).cast("int"),
        (F.col("event_id") % 256).cast("int"),
        F.col("event_type"),
        F.col("user_id"),
        F.col("event_id"),
    )
    p = parse_grok(line, "%{IP:client} %{WORD:method} %{URIPATH:path} %{NUMBER:millis}")
    return e.select(
        "event_id",
        p["client"].alias("client"),
        p["method"].alias("method"),
        p["path"].alias("path"),
        p["millis"].cast("double").alias("millis"),
    )


def q_vrl_case_strings(spark, sf_dir):
    from vector_spark.functions import kebabcase, pascalcase, snakecase, truncate

    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        snakecase(F.col("c_name")).alias("snake"),
        kebabcase(F.col("c_name")).alias("kebab"),
        pascalcase(F.col("c_mktsegment")).alias("pascal_seg"),
        truncate(F.col("c_name"), 12, "...").alias("short_name"),
    )


def q_vrl_ip_functions(spark, sf_dir):
    from vector_spark.functions import ip_aton, ip_cidr_contains, ip_ntoa, ip_subnet

    e = _t(spark, sf_dir, "events")
    ip = F.format_string(
        "10.%d.%d.%d",
        (F.col("user_id") % 128).cast("int"),
        (F.col("event_id") % 256).cast("int"),
        ((F.col("event_id") * 7) % 256).cast("int"),
    )
    return e.select(
        "event_id",
        ip.alias("ip"),
        ip_aton(ip).alias("ip_num"),
        ip_ntoa(ip_aton(ip)).alias("ip_roundtrip"),
        ip_cidr_contains("10.0.0.0/10", ip).alias("in_lower_half"),
        ip_subnet(ip, 16).alias("subnet16"),
    )


def q_vrl_ipv6_functions(spark, sf_dir):
    """IPv6 family: expand-to-canonical of a compressed hex address,
    IPv4 -> mapped-IPv6, mapped-IPv6 -> IPv4 (dotted-tail form)."""
    from vector_spark.functions import ip_to_ipv6, ipv6_expand, ipv6_to_ipv4

    e = _t(spark, sf_dir, "events")
    ip4 = F.format_string(
        "10.%d.%d.%d",
        (F.col("user_id") % 128).cast("int"),
        (F.col("event_id") % 256).cast("int"),
        ((F.col("event_id") * 7) % 256).cast("int"),
    )
    v6 = F.format_string(
        "2001:db8::%x:%x",
        (F.col("user_id") % 65536).cast("int"),
        (F.col("event_id") % 65536).cast("int"),
    )
    mapped = F.concat(F.lit("::ffff:"), ip4)
    return e.select(
        "event_id",
        v6.alias("v6"),
        ipv6_expand(v6).alias("v6_full"),
        ip_to_ipv6(ip4).alias("mapped"),
        ipv6_to_ipv4(mapped).alias("unmapped"),
    )


def q_vrl_encode(spark, sf_dir):
    from vector_spark.functions import encode_base16, encode_base64, redact

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        encode_base64(F.substring("text", 1, 24)).alias("head_b64"),
        encode_base16(F.substring("text", 1, 8)).alias("head_hex"),
        redact(F.col("text"), [r"[0-9]+"], "#").alias("redacted"),
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


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Character-trigram Jaccard near-dup pairs (brute-force verify at this
    scale; the LSH-banded variant is dedup_minhash_lsh)."""
    d = _t(spark, sf_dir, "documents")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(1))),
            lambda i: F.col("text").substr(i, F.lit(3)),
        )
    )
    docs = d.select(F.col("doc_id").alias("doc"), grams.alias("g"))
    a = docs.select(F.col("doc").alias("doc_a"), F.col("g").alias("g_a"))
    b = docs.select(F.col("doc").alias("doc_b"), F.col("g").alias("g_b"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = (F.size("g_a") + F.size("g_b")).cast("double") - inter
    jac = F.round(inter / union, 4)
    return pairs.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.6
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
    Sketch): approx_percentile with accuracy 10k — mergeable bounded state,
    the 100 TB path. Rows-only driver check (sketch values are
    engine-specific); tests/test_aggregate.py bounds |approx - exact| by
    the rank-error tolerance."""
    from vector_spark.operators import aggregate_summary

    e = _t(spark, sf_dir, "events")
    return aggregate_summary(
        e, quantiles=[0.5, 0.9], window_secs=86400 * 7,
        ts_col="ts", series_cols=["event_type"], approx=True,
    )


def q_sample_group_modulo(spark, sf_dir):
    from vector_spark.operators import sample_group_modulo

    e = _t(spark, sf_dir, "events")
    return sample_group_modulo(e, 20, ["user_id"], "event_id").select(
        "event_id", "user_id", "sample_rate"
    )


def q_embedding_near_dup(spark, sf_dir):
    """Banded-LSH candidate generation (ids-only shuffle) + cosine verify —
    the default, scale-safe path; the oracle replays the identical literal
    hyperplanes so the (recall<1) candidate set matches exactly."""
    from vector_spark.datapipe import embedding_near_dup_pairs

    return embedding_near_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.35)


def q_tfidf_keywords(spark, sf_dir):
    """Per-doc top-5 keywords by smoothed tf-idf (round-6 score, term
    tie-break) — dictionary-sized shuffles, term join never broadcast."""
    from vector_spark.datapipe import tfidf_keywords

    return tfidf_keywords(_t(spark, sf_dir, "documents"), k=5)


def q_pagerank(spark, sf_dir):
    """Fixed-point integer PageRank (3 unrolled rounds, damping 85%) over a
    synthetic 4-regular doc link graph: out-link j of doc d is
    md5_u32('pr|d|j') % n — replayable in any engine, deterministic, skewed
    in-degree. Integer ranks make the result bit-exact vs the oracle."""
    from vector_spark.datapipe import pagerank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n_row = docs.groupBy().agg(F.count(F.lit(1)).alias("_n"))

    def u32(s):
        return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")

    edges = docs.join(F.broadcast(n_row)).select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    F.pmod(
                        u32(F.concat(F.lit("pr|"), F.col("doc_id").cast("string"), F.lit(f"|{j}"))),
                        F.col("_n"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("dst"),
    )
    return pagerank(docs, edges, iterations=3, damping_pct=85, out_deg=4, id_col="doc_id")


def q_bpe_pair_counts(spark, sf_dir):
    """One BPE-training merge round: corpus-wide adjacent-char pair counts
    weighted by word frequency; rank 1 = the merge BPE performs next."""
    from vector_spark.datapipe import bpe_pair_counts

    return bpe_pair_counts(_t(spark, sf_dir, "documents"), top_n=50)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup: nearest-of-16-deterministic-centroids clustering, then
    within-cluster cosine pruning (lowest id survives a >=0.35 pair).
    Every row comes back with its cluster + centroid cosine + keep flag."""
    from vector_spark.datapipe import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, n_centroids=16
    )


def q_ann_ivf(spark, sf_dir):
    from vector_spark.datapipe import ivf_ann_topk

    return ivf_ann_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[100, 101, 102],
        k=5, n_centroids=16, n_probe=4,
    ).withColumn("rank", F.col("rank").cast("long"))


def q_demo_logs_roundtrip(spark, sf_dir):
    """demo_logs generator -> parse_syslog round-trip (rows-only: generated
    input, not an sf table). Nonzero parse rate is asserted structurally."""
    from vector_spark.functions import parse_syslog
    from vector_spark.sources import demo_logs

    logs = demo_logs(spark, 5000, fmt="bsd_syslog", partitions=8)
    p = parse_syslog(F.col("line"))
    return logs.select(
        "id",
        p["hostname"].alias("hostname"),
        p["appname"].alias("appname"),
        p["severity"].alias("severity"),
        p["message"].alias("message"),
    ).filter(F.col("hostname") != "")


def q_multimodal_features(spark, sf_dir):
    """Media feature-extraction plumbing (stubbed codec, real Arrow path) ->
    embedding column consumable by the ANN operators; rows-only."""
    from vector_spark.datapipe import extract_features

    d = _t(spark, sf_dir, "documents").withColumn("payload", F.encode("text", "UTF-8"))
    feats = extract_features(d, dims=16)
    return feats.select(
        "doc_id",
        F.size("embedding").alias("dims"),
        F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x), 4).alias("feat_sum"),
    )


def q_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing (1->N Arrow expansion); rows-only."""
    from vector_spark.datapipe import frame_sample

    d = _t(spark, sf_dir, "documents").withColumn("payload", F.encode("text", "UTF-8"))
    return frame_sample(d, every_ms=1000).select(
        "doc_id", "frame_idx", "offset_ms", "frame_sha"
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


def q_parse_aws_vpc_flow(spark, sf_dir):
    """parse_aws_vpc_flow_log round-trip: build a deterministic v2 flow-log
    line per event (error events get '-' srcport/action to exercise the
    null path), parse it, emit the typed fields. The oracle reconstructs
    the expected fields directly from the source columns."""
    from vector_spark.functions import parse_aws_vpc_flow_log

    e = _t(spark, sf_dir, "events")
    srcaddr = F.format_string(
        "10.%d.%d.1", (F.col("user_id") % 128).cast("int"), (F.col("event_id") % 250).cast("int")
    )
    is_err = F.col("event_type") == "error"
    srcport = F.when(is_err, F.lit("-")).otherwise((F.col("event_id") % 60000).cast("string"))
    action = F.when(is_err, F.lit("-")).otherwise(F.lit("ACCEPT"))
    start_s = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("long")
    line = F.format_string(
        "2 %d eni-%d %s 10.0.0.1 %s 443 6 %d %d %d %d %s OK",
        F.col("user_id"), F.col("event_id"), srcaddr, srcport,
        (F.col("event_id") % 100).cast("long"),
        F.round(F.col("value") * 100).cast("long"),
        start_s, start_s + F.lit(60), action,
    )
    p = parse_aws_vpc_flow_log(line)
    return e.select(
        "event_id",
        p["version"].alias("version"),
        p["account_id"].alias("account_id"),
        p["interface_id"].alias("interface_id"),
        p["srcaddr"].alias("srcaddr"),
        p["srcport"].alias("srcport"),
        p["protocol"].alias("protocol"),
        p["packets"].alias("packets"),
        p["bytes"].alias("bytes"),
        p["start"].alias("start_ts"),
        p["end"].alias("end_ts"),
        p["action"].alias("action"),
        p["log_status"].alias("log_status"),
    )


def q_parse_aws_alb(spark, sf_dir):
    """parse_aws_alb_log round-trip: deterministic ALB access line per
    event; '-' target/ssl fields exercise nulls; processing time is an
    exact-3-decimal literal so the double parses identically everywhere."""
    from vector_spark.functions import parse_aws_alb_log

    e = _t(spark, sf_dir, "events")
    tpt = F.format_string("0.%03d", (F.col("event_id") % 1000).cast("int"))
    status = F.when(F.col("event_type") == "error", F.lit("500")).otherwise(F.lit("200"))
    line = F.format_string(
        'http 2024-01-01T00:00:00.000000Z app/lb/%d 192.168.1.%d:%d - 0.001 %s 0.000 '
        '%s %s %d %d "GET http://example.com/u/%d HTTP/1.1" "agent-%d" - - '
        'arn:aws:elb:tg/%d "Root=1-%d"',
        F.col("user_id"), (F.col("user_id") % 250).cast("int"),
        (F.col("event_id") % 60000).cast("int") + F.lit(1024), tpt, status, status,
        F.col("event_id") % 4096, F.col("event_id") % 8192,
        F.col("user_id"), F.col("user_id"), F.col("user_id"), F.col("event_id"),
    )
    p = parse_aws_alb_log(line)
    return e.select(
        "event_id",
        p["type"].alias("type"),
        p["elb"].alias("elb"),
        p["client_host"].alias("client_host"),
        p["target_host"].alias("target_host"),
        p["target_processing_time"].alias("target_processing_time"),
        p["elb_status_code"].alias("elb_status_code"),
        p["received_bytes"].alias("received_bytes"),
        p["sent_bytes"].alias("sent_bytes"),
        p["request_method"].alias("request_method"),
        p["request_url"].alias("request_url"),
        p["user_agent"].alias("user_agent"),
        p["ssl_cipher"].alias("ssl_cipher"),
        p["trace_id"].alias("trace_id"),
    )


def q_parse_xml(spark, sf_dir):
    """parse_xml via Spark's built-in xpath_* expressions: build a
    deterministic XML doc per event, extract typed fields; the oracle
    reconstructs the fields from the source columns."""
    from vector_spark.functions import parse_xml_fields

    e = _t(spark, sf_dir, "events")
    doc = F.format_string(
        "<event><id>%d</id><user>%d</user><type>%s</type><v>%.2f</v></event>",
        F.col("event_id"), F.col("user_id"), F.col("event_type"), F.col("value"),
    )
    p = parse_xml_fields(
        doc,
        {
            "xid": ("long", "/event/id/text()"),
            "xuser": ("long", "/event/user/text()"),
            "xtype": ("string", "/event/type/text()"),
            "xv": ("double", "/event/v/text()"),
        },
    )
    return e.select(
        "event_id",
        p["xid"].alias("xid"),
        p["xuser"].alias("xuser"),
        p["xtype"].alias("xtype"),
        p["xv"].alias("xv"),
    )


def q_codec_framing_chardelim(spark, sf_dir):
    """CharacterDelimited framing: one buffer holds 3 '|'-separated frames;
    posexplode emits (event_id, idx, frame) — the 1->N framing shape."""
    from vector_spark.functions import frame_character_delimited

    e = _t(spark, sf_dir, "events")
    buf = F.concat_ws(
        "|", F.col("event_type"), F.col("user_id").cast("string"),
        F.col("event_id").cast("string"),
    )
    return e.select(
        "event_id", F.posexplode(frame_character_delimited(buf, "|")).alias("idx", "frame")
    )


def q_codec_framing_octet(spark, sf_dir):
    """OctetCounting framing (RFC 6587): '<LEN> <MSG>' repeated; the
    Arrow-batched frame parser must recover exactly the two messages."""
    from vector_spark.functions import frame_octet_counting

    e = _t(spark, sf_dir, "events")
    buf = F.format_string(
        "%d %s%d %s",
        F.length("event_type"), F.col("event_type"),
        F.length("props"), F.col("props"),
    )
    return e.select(
        "event_id", F.posexplode(frame_octet_counting(buf)).alias("idx", "frame")
    )


def q_codec_netflow_v9(spark, sf_dir):
    """NetFlow v9 template-based decode (netflow.rs:8-13): each event is
    encoded as a v9 packet (20-byte header + one 21-byte data record in
    flowset 256, padded to 4 bytes) with pure hex exprs; the template
    arrives in a SEPARATE packet, so decoding exercises the two-pass
    template-broadcast machinery. The oracle recomputes the expected flow
    tuples straight from the events table — field-exact round-trip."""
    from vector_spark.functions import parse_netflow

    e = _t(spark, sf_dir, "events")

    def hexn(col, nbytes):
        return F.lpad(F.lower(F.hex(col)), nbytes * 2, "0")

    secs = F.floor(
        F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
    ).cast("long")
    eid = F.col("event_id")
    src_hex = F.concat(
        hexn(F.lit(10), 1),
        hexn(F.expr("CAST((event_id div 65536) % 256 AS INT)"), 1),
        hexn(F.expr("CAST((event_id div 256) % 256 AS INT)"), 1),
        hexn(F.expr("CAST(event_id % 256 AS INT)"), 1),
    )
    dst_hex = F.concat(
        hexn(F.lit(192), 1), hexn(F.lit(168), 1), hexn(F.lit(1), 1),
        hexn(F.expr("CAST(event_id % 200 + 1 AS INT)"), 1),
    )
    srcport = (eid % 50000 + 1024).cast("long")
    dstport = F.when(eid % 2 == 0, F.lit(443)).otherwise(F.lit(80)).cast("long")
    pkts = (eid % 1000 + 1).cast("long")
    octets = ((eid % 1000 + 1) * 64).cast("long")
    proto = F.when(eid % 3 == 0, F.lit(17)).otherwise(F.lit(6)).cast("long")

    header = F.concat(
        hexn(F.lit(9), 2), hexn(F.lit(1), 2), hexn(F.lit(0), 4),
        hexn(secs, 4), hexn(F.lit(0), 4), hexn(F.lit(1), 4),
    )
    record = F.concat(
        src_hex, dst_hex, hexn(srcport, 2), hexn(dstport, 2),
        hexn(pkts, 4), hexn(octets, 4), hexn(proto, 1),
    )
    flowset = F.concat(
        hexn(F.lit(256), 2), hexn(F.lit(28), 2), record, F.lit("000000")
    )
    data_pkts = e.select(F.unhex(F.concat(header, flowset)).alias("packet"))

    # the template packet: v9 header + flowset 0 defining template 256
    def _u(v, n):
        return int(v).to_bytes(n, "big")

    t_fields = [(8, 4), (12, 4), (7, 2), (11, 2), (2, 4), (1, 4), (4, 1)]
    t_body = _u(256, 2) + _u(len(t_fields), 2) + b"".join(
        _u(f, 2) + _u(l, 2) for f, l in t_fields
    )
    tpl_packet = (
        _u(9, 2) + _u(1, 2) + _u(0, 4) + _u(0, 4) + _u(0, 4) + _u(1, 4)
        + _u(0, 2) + _u(4 + len(t_body), 2) + t_body
    )
    tpl_df = spark.createDataFrame([(bytearray(tpl_packet),)], "packet binary")

    out = parse_netflow(tpl_df.unionByName(data_pkts))
    f = F.col("fields")
    return out.filter(f.isNotNull()).select(
        F.col("export_time"),
        f.getItem("ipv4_src_addr").alias("srcaddr"),
        f.getItem("ipv4_dst_addr").alias("dstaddr"),
        f.getItem("l4_src_port").cast("long").alias("srcport"),
        f.getItem("l4_dst_port").cast("long").alias("dstport"),
        f.getItem("in_pkts").cast("long").alias("packets"),
        f.getItem("in_bytes").cast("long").alias("octets"),
        f.getItem("protocol").cast("long").alias("proto"),
    )


def _dnstap_fixture_frames() -> list[str]:
    """Four deterministic dnstap frames (public dnstap.proto wire format),
    hand-encoded at plan time — the parse side must recover exactly what
    was encoded, so the oracle enumerates these constants by event_id%4."""
    import base64

    def u(v, n):
        return int(v).to_bytes(n, "big")

    def pb(fno, wt, payload):
        tag = bytes([(fno << 3) | wt])
        if wt == 2:
            return tag + bytes([len(payload)]) + payload
        if wt == 5:
            return tag + payload
        return tag + payload  # wt 0: payload is pre-encoded varint bytes

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def dns(qid, qr, labels, qtype):
        name = b"".join(bytes([len(l)]) + l.encode() for l in labels) + b"\x00"
        flags = 0x8000 if qr else 0
        return (u(qid, 2) + u(flags, 2) + u(1, 2) + u(0, 2) + u(0, 2) + u(0, 2)
                + name + u(qtype, 2) + u(1, 2))

    variants = [
        # (mtype, family, proto, src, sport, resp, rport, t_sec, t_nsec, labels, qtype, qr)
        (5, 1, 1, bytes([10, 0, 0, 1]), 1053, None, None,
         1700000000, 11, ["a0", "example", "com"], 1, 0),
        (6, 1, 1, None, None, bytes([10, 0, 0, 2]), 53,
         1700000001, 22, ["a1", "example", "org"], 28, 1),
        (3, 2, 2, b"\x00" * 15 + b"\x01", 2053, None, None,
         1700000002, 33, ["a2", "example", "net"], 16, 0),
        (7, 1, 1, bytes([192, 168, 5, 5]), 5353, None, None,
         1700000003, 44, ["a3", "example", "io"], 15, 0),
    ]
    frames = []
    for i, (mt, fam, proto, src, sport, resp, rport, tsec, tnsec, labels,
            qtype, qr) in enumerate(variants):
        m = pb(1, 0, varint(mt)) + pb(2, 0, varint(fam)) + pb(3, 0, varint(proto))
        if src is not None:
            m += pb(4, 2, src) + pb(6, 0, varint(sport))
        if resp is not None:
            m += pb(5, 2, resp) + pb(7, 0, varint(rport))
        if mt % 2 == 0:  # response: response_time (11 varint? no: 12/13)
            m += pb(12, 0, varint(tsec)) + pb(13, 5, int(tnsec).to_bytes(4, "little"))
            m += pb(14, 2, dns(100 + i, qr, labels, qtype))
        else:
            m += pb(8, 0, varint(tsec)) + pb(9, 5, int(tnsec).to_bytes(4, "little"))
            m += pb(10, 2, dns(100 + i, qr, labels, qtype))
        frame = (pb(1, 2, b"vs-test") + pb(2, 2, b"v1")
                 + pb(15, 0, varint(1)) + pb(14, 2, m))
        frames.append(base64.b64encode(frame).decode())
    return frames


def q_parse_dnstap(spark, sf_dir):
    """VRL parse_dnstap (parse_dnstap.cue): pure-Python protobuf
    wire-format walker over the public dnstap schema, Arrow-batched.
    Each event gets one of four hand-encoded frames (event_id%4); the
    oracle enumerates the encoded constants — field-exact decode check."""
    from vector_spark.functions import parse_dnstap

    e = _t(spark, sf_dir, "events")
    frames = _dnstap_fixture_frames()
    frame = F.element_at(
        F.array(*[F.lit(x) for x in frames]), (F.col("event_id") % 4 + 1).cast("int")
    )
    d = parse_dnstap(frame)
    return e.select(
        "event_id",
        d.getField("messageType").alias("message_type"),
        d.getField("messageTypeId").alias("message_type_id"),
        d.getField("socketFamily").alias("socket_family"),
        d.getField("socketProtocol").alias("socket_protocol"),
        d.getField("sourceAddress").alias("source_address"),
        d.getField("sourcePort").alias("source_port"),
        d.getField("responseAddress").alias("response_address"),
        d.getField("responsePort").alias("response_port"),
        d.getField("time").alias("time_ns"),
        d.getField("header_id").alias("header_id"),
        d.getField("header_qr").alias("header_qr"),
        d.getField("question_name").alias("question_name"),
        d.getField("question_type").alias("question_type"),
        d.getField("serverId").alias("server_id"),
    )


def q_vrl_misc(spark, sf_dir):
    """Grouped VRL straggler sweep (to_syslog_level/severity/facility,
    parse_int with prefixes, format_int, deterministic random_*, friendly
    id round-trip): every output is a pure function of event_id/ts so the
    oracle re-derives each one. The friendly-id pair is exercised as
    encode-then-decode around uuid_v7_deterministic — the round-trip must
    return the original uuid, whose SQL twin already exists."""
    from vector_spark.functions import (
        format_int_vrl, friendly_id_from_uuid, parse_float_vrl, parse_int_vrl,
        random_bool_seeded, random_int_seeded, to_syslog_facility,
        to_syslog_level, to_syslog_severity, uuid_from_friendly_id,
        uuid_v7_deterministic,
    )

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    level = to_syslog_level(eid % 8)
    hex_str = F.concat(F.lit("0x"), F.lower(F.hex(eid)))
    u7 = uuid_v7_deterministic(F.col("ts"), eid)
    return e.select(
        "event_id",
        level.alias("syslog_level"),
        to_syslog_severity(level).alias("syslog_severity"),
        to_syslog_facility(eid % 24).alias("syslog_facility"),
        parse_int_vrl(hex_str).alias("parsed_hex"),
        parse_float_vrl(F.concat(eid.cast("string"), F.lit(".5e1"))).alias("parsed_float"),
        parse_float_vrl(F.lit("not a number")).alias("parsed_float_bad"),
        format_int_vrl(eid, 16).alias("formatted_hex"),
        random_int_seeded(eid, 0, 100).alias("rand_int"),
        random_bool_seeded(eid).alias("rand_bool"),
        uuid_from_friendly_id(friendly_id_from_uuid(u7)).alias("uuid_roundtrip"),
    )


def q_normalize_text(spark, sf_dir):
    """NFC normalization over text with a decomposed-accent suffix
    appended (e + combining acute), lowercased, whitespace-collapsed —
    the canonicalization pass before dedup hashing. The oracle uses
    DuckDB's nfc_normalize on the identical construction."""
    from vector_spark.datapipe import normalize_text

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("text"), F.lit("  CAFE\u0301 caf\u00e9")).alias("text"),
    )
    return normalize_text(d, form="NFC", lower=True, collapse_ws=True)


def q_codec_cdx(spark, sf_dir):
    """Common Crawl CDXJ index lines, synthesized deterministically from
    documents then parsed with parse_cdx; the oracle produces the expected
    fields directly from the same construction (ground truth, not a
    parallel parser)."""
    from vector_spark.functions import parse_cdx

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    js = F.concat(
        F.lit('{"url": "https://example.org/p/'), did,
        F.lit('", "mime": "text/html", "status": "200", "digest": "'),
        F.md5(F.col("text").cast("binary")),
        F.lit('", "length": "'), F.col("n_chars").cast("string"),
        F.lit('", "offset": "'), (F.col("doc_id") * 100).cast("string"),
        F.lit('", "filename": "crawl-00.warc.gz"}'),
    )
    line = F.concat(
        F.lit("org,example)/p/"), did, F.lit(" "),
        F.lit("20240101"), F.lpad((F.col("doc_id") % 1000000).cast("string"), 6, "0"),
        F.lit(" "), js,
    )
    p = parse_cdx(line)
    return d.select(
        "doc_id",
        p.getField("urlkey").alias("urlkey"),
        p.getField("ts").alias("ts"),
        p.getField("url").alias("url"),
        p.getField("mime").alias("mime"),
        p.getField("status").alias("status"),
        p.getField("digest").alias("digest"),
        p.getField("length").alias("length"),
        p.getField("offset").alias("offset"),
        p.getField("filename").alias("filename"),
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


def q_corpus_stats(spark, sf_dir):
    """ROLLUP(lang, source) corpus report: docs/tokens/chars/distinct-text
    counts and mean tokens per slice, per lang subtotal, and grand total —
    one shuffle (grouping sets expand before the exchange)."""
    from vector_spark.datapipe import corpus_stats

    return corpus_stats(_t(spark, sf_dir, "documents"))


def q_incremental_dedup(spark, sf_dir):
    """Crawl-maintenance dedup: docs with doc_id % 4 == 0 play the new
    snapshot, the rest the existing corpus; exact md5 tier + minhash near
    tier (same hash family as dedup_minhash_lsh), exact precedence,
    lowest-corpus-id attribution."""
    from vector_spark.datapipe import incremental_dedup

    d = _t(spark, sf_dir, "documents")
    delta = d.filter(F.col("doc_id") % 4 == 0)
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    return incremental_dedup(delta, corpus, near=True, threshold=0.5)


def q_robots_filter(spark, sf_dir):
    """Crawl-politeness gate: per-host robots.txt (synthesized — a star
    group with a Disallow/Allow pair whose paths derive from md5(host),
    plus a stricter bot group that must NOT apply) parsed to rules, then
    longest-match URL admission per RFC 9309 §2.2.2."""
    from vector_spark.datapipe import parse_robots_rules, robots_filter

    d = _t(spark, sf_dir, "documents")
    hosts = d.select(F.col("source").alias("host")).distinct()
    hu = F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10).cast("long")
    content = F.concat(
        F.lit("User-agent: *\nDisallow: /p"), (hu % 8).cast("string"),
        F.lit("\nAllow: /p"), (hu % 8).cast("string"), F.lit("/ok"),
        F.lit("\nDisallow: /w*/x$"),
        F.lit("\nUser-agent: bot\nDisallow: /"),
    )
    robots = hosts.select("host", content.alias("robots_txt"))
    rules = parse_robots_rules(robots, agent="*")
    urls = d.select(
        "doc_id",
        F.col("source").alias("host"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("/w"), (F.col("doc_id") % 4).cast("string"), F.lit("/x")),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("/w"), (F.col("doc_id") % 4).cast("string"), F.lit("/xy")),
        )
        .otherwise(
            F.concat(
                F.lit("/p"), (F.col("doc_id") % 8).cast("string"),
                F.when(F.col("doc_id") % 3 == 0, F.lit("/ok/x")).otherwise(F.lit("/y")),
            )
        )
        .alias("path"),
    )
    return robots_filter(urls, rules, url_col="doc_id")


def q_vrl_types(spark, sf_dir):
    """Grouped VRL type-predicate/coercion sweep (is_json/is_array/
    is_integer/is_float/is_nullish/to_bool/to_int/format_number/
    contains_all/match_any): each row cycles through a JSON-encoded value
    shape derived from event_id, so the oracle replays every branch."""
    from vector_spark.functions import (
        contains_all, format_number_vrl, is_array_str, is_boolean_str,
        is_empty, is_float_str, is_integer_str, is_json, is_null_str,
        is_nullish, is_object_str, is_string_str, is_timestamp_str,
        match_any, match_array, to_bool_vrl, to_float_vrl, to_int_vrl,
        to_string_vrl,
    )

    e = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    v = (
        F.when(eid % 6 == 0, F.lit("123"))
        .when(eid % 6 == 1, F.lit("1.5e2"))
        .when(eid % 6 == 2, F.lit('"hi"'))
        .when(eid % 6 == 3, F.lit("[1,2]"))
        .when(eid % 6 == 4, F.lit('{"a":1}'))
        .otherwise(F.lit("null"))
    )
    nv = (
        F.when(eid % 3 == 0, F.lit(""))
        .when(eid % 3 == 1, F.lit(" - "))
        .otherwise(F.lit("x"))
    )
    bw = (
        F.when(eid % 5 == 0, F.lit("yes"))
        .when(eid % 5 == 1, F.lit("NO"))
        .when(eid % 5 == 2, F.lit("1"))
        .when(eid % 5 == 3, F.lit("false"))
        .otherwise(F.lit("maybe"))
    )
    tstr = F.when(eid % 2 == 0, F.lit("2024-01-01 00:00:00")).otherwise(F.lit("not a time"))
    msg = F.concat(F.lit("evt-"), (eid % 10).cast("string"), F.lit("-end"))
    return e.select(
        "event_id",
        is_json(v).alias("v_is_json"),
        is_integer_str(v).alias("v_is_int"),
        is_float_str(v).alias("v_is_float"),
        is_string_str(v).alias("v_is_string"),
        is_array_str(v).alias("v_is_array"),
        is_object_str(v).alias("v_is_object"),
        is_null_str(v).alias("v_is_null"),
        is_boolean_str(v).alias("v_is_bool"),
        is_timestamp_str(tstr).alias("v_is_ts"),
        is_nullish(nv).alias("v_is_nullish"),
        to_bool_vrl(bw).alias("v_to_bool"),
        to_int_vrl(v).alias("v_to_int"),
        format_number_vrl((eid % 1000).cast("double") * 1111.0 + 0.25, 2).alias("v_fmt"),
        contains_all(msg, ["evt-", "-end"]).alias("v_contains_all"),
        match_any(msg, [r"evt-[0-4]-", r"never"]).alias("v_match_any"),
        is_empty(nv).alias("v_is_empty"),
        to_float_vrl(v).alias("v_to_float"),
        to_string_vrl(eid % 7).alias("v_to_string"),
        match_array(F.split(msg, "-"), r"^[0-4]$").alias("v_match_array"),
    )


def q_vrl_uuid_v7(spark, sf_dir):
    """Deterministic uuid_v7: RFC 9562 layout with md5-derived random bits
    — replayable, time-ordered, oracle-expressible (same hex math in SQL)."""
    from vector_spark.functions import uuid_v7_deterministic

    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        uuid_v7_deterministic(F.col("ts"), F.col("event_id")).alias("uuid7"),
    )


def q_vrl_hmac(spark, sf_dir):
    """VRL hmac: keyed MAC per event message (rows-only driver check —
    DuckDB has no HMAC; RFC 4231 vectors are asserted in
    tests/test_vrl_functions.py)."""
    from vector_spark.functions import hmac_hex

    e = _t(spark, sf_dir, "events")
    msg = F.concat_ws(":", F.col("event_type"), F.col("event_id").cast("string"))
    return e.select(
        "event_id",
        hmac_hex(msg, "topsecret", "sha256").alias("mac_sha256"),
        hmac_hex(msg, "topsecret", "sha1").alias("mac_sha1"),
    )


def q_codec_influxdb(spark, sf_dir):
    """Influxdb line-protocol round-trip: encode each event as a line
    (sorted tags, i-suffixed int field, epoch-ns ts), parse it back, emit
    the parsed pieces; oracle reconstructs them from the source columns."""
    from vector_spark.functions import parse_influxdb_line

    e = _t(spark, sf_dir, "events")
    ns = F.unix_micros(F.col("ts").cast("timestamp")) * 1000
    line = F.format_string(
        "events,type=%s,user=%d value=%.2f,n=%di %d",
        F.col("event_type"), F.col("user_id"), F.col("value"),
        (F.col("event_id") % 100).cast("int"), ns,
    )
    p = parse_influxdb_line(line)
    return e.select(
        "event_id",
        p["measurement"].alias("measurement"),
        p["tags"].getItem("type").alias("tag_type"),
        p["tags"].getItem("user").cast("long").alias("tag_user"),
        p["fields"].getItem("value").cast("double").alias("f_value"),
        p["fields"].getItem("n").cast("long").alias("f_n"),
        p["timestamp_ns"].alias("ts_ns"),
    )


def q_codec_native_json(spark, sf_dir):
    """Vector-native JSON event round-trip: serialize each event as
    {"log": {...}} (encode_native_json_log), deserialize with
    parse_native_json, emit kind + extracted fields; metric events are
    synthesized for purchase rows to exercise the metric branch."""
    from vector_spark.functions import encode_native_json_log, parse_native_json

    e = _t(spark, sf_dir, "events")
    is_metric = F.col("event_type") == "purchase"
    log_doc = encode_native_json_log(
        {"etype": F.col("event_type"), "uid": F.col("user_id").cast("string")}
    )
    metric_doc = F.format_string(
        '{"metric": {"name": "revenue", "kind": "incremental", "counter": {"value": %.2f}}}',
        F.col("value"),
    )
    doc = F.when(is_metric, metric_doc).otherwise(log_doc)
    p = parse_native_json(doc)
    return e.select(
        "event_id",
        p["kind"].alias("kind"),
        p["log"].getItem("etype").alias("log_etype"),
        p["log"].getItem("uid").cast("long").alias("log_uid"),
        p["metric_name"].alias("metric_name"),
        p["metric_kind"].alias("metric_kind"),
        p["counter_value"].alias("counter_value"),
    )


def q_codec_csv(spark, sf_dir):
    """Csv deserializer round-trip: encode columns as a csv line, decode
    with from_csv; oracle reconstructs the expected struct fields directly."""
    from vector_spark.functions import parse_csv_line

    e = _t(spark, sf_dir, "events")
    line = F.concat_ws(
        ",", F.col("event_id").cast("string"), F.col("event_type"),
        F.format_string("%.2f", F.col("value")),
    )
    parsed = parse_csv_line(line, "id BIGINT, etype STRING, v DOUBLE")
    return e.select(
        "event_id",
        parsed.getField("id").alias("id"),
        parsed.getField("etype").alias("etype"),
        parsed.getField("v").alias("v"),
    )


def q_codec_json(spark, sf_dir):
    """Json deserializer with declared schema (lib/codecs decoding::Json)."""
    from vector_spark.functions import parse_json_doc

    e = _t(spark, sf_dir, "events")
    doc = F.to_json(F.struct(F.col("user_id").alias("u"), F.col("event_type").alias("t")))
    parsed = parse_json_doc(doc, "u BIGINT, t STRING")
    return e.select(
        "event_id",
        parsed.getField("u").alias("u"),
        parsed.getField("t").alias("t"),
    )


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pipeline_events_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "remap_parse_json": q_remap_parse_json,
        "filter_errors": q_filter_errors,
        "route_multi": q_route_multi,
        "route_exclusive": q_route_exclusive,
        "dedupe_first": q_dedupe_first,
        "dedupe_lru": q_dedupe_lru,
        "sample_hash": q_sample_hash,
        "reduce_sessions": q_reduce_sessions,
        "aggregate_tumbling": q_aggregate_tumbling,
        "aggregate_latest": q_aggregate_latest,
        "aggregate_stdev": q_aggregate_stdev,
        "aggregate_diff": q_aggregate_diff,
        "throttle": q_throttle,
        "log_to_metric": q_log_to_metric,
        "metric_to_log": q_metric_to_log,
        "tag_cardinality_limit": q_tag_cardinality_limit,
        "hash_replace": q_hash_replace,
        "enrich_customer": q_enrich_customer,
        "enrich_between": q_enrich_between,
        "enrich_geoip": q_enrich_geoip,
        "pipeline_events_e2e": q_pipeline_events_e2e,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "tpch_q18": q_tpch_q18,
        "tpch_q4": q_tpch_q4,
        "tpch_q13": q_tpch_q13,
        "tpch_q16": q_tpch_q16,
        "tpch_q22": q_tpch_q22,
        "tpch_q2": q_tpch_q2,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "tpch_q10": q_tpch_q10,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q14": q_tpch_q14,
        "tpch_q15": q_tpch_q15,
        "tpch_q17": q_tpch_q17,
        "tpch_q19": q_tpch_q19,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "dedup_exact_text": q_dedup_exact_text,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ladder": q_dedup_ladder,
        "dedup_clusters": q_dedup_clusters,
        "dedup_spans": q_dedup_spans,
        "dedup_simhash": q_dedup_simhash,
        "text_quality": q_text_quality,
        "quality_gopher": q_quality_gopher,
        "quality_repetition": q_quality_repetition,
        "chunk_documents": q_chunk_documents,
        "curation_pipeline": q_curation_pipeline,
        "pii_scrub": q_pii_scrub,
        "sample_stratified": q_sample_stratified,
        "decontaminate": q_decontaminate,
        "shuffle_corpus": q_shuffle_corpus,
        "url_filter": q_url_filter,
        "perplexity_bucket": q_perplexity_bucket,
        "dsir_resample": q_dsir_resample,
        "mixture_sample": q_mixture_sample,
        "pack_sequences": q_pack_sequences,
        "corpus_build": q_corpus_build,
        "quality_classifier": q_quality_classifier,
        "boilerplate_blocks": q_boilerplate_blocks,
        "html_text": q_html_text,
        "codec_warc": q_codec_warc,
        "crawl_pipeline": q_crawl_pipeline,
        "token_count": q_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "langid": q_langid,
        "cosine_topk": q_cosine_topk,
        "ann_lsh": q_ann_lsh,
        "multimodal_meta": q_multimodal_meta,
        "pages_pipeline": q_pages_pipeline,
        "vrl_parse_syslog": q_vrl_parse_syslog,
        "vrl_parse_grok": q_vrl_parse_grok,
        "vrl_case_strings": q_vrl_case_strings,
        "vrl_ip_functions": q_vrl_ip_functions,
        "vrl_ipv6_functions": q_vrl_ipv6_functions,
        "vrl_encode": q_vrl_encode,
        "reduce_merge_full": q_reduce_merge_full,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "topology_events": q_topology_events,
        "streaming_aggregate": q_streaming_aggregate,
        "aggregate_set": q_aggregate_set,
        "aggregate_histogram": q_aggregate_histogram,
        "aggregate_summary": q_aggregate_summary,
        "aggregate_sketch": q_aggregate_sketch,
        "aggregate_summary_approx": q_aggregate_summary_approx,
        "sample_group_modulo": q_sample_group_modulo,
        "embedding_near_dup": q_embedding_near_dup,
        "semantic_dedup": q_semantic_dedup,
        "bpe_pair_counts": q_bpe_pair_counts,
        "pagerank": q_pagerank,
        "tfidf_keywords": q_tfidf_keywords,
        "vrl_types": q_vrl_types,
        "robots_filter": q_robots_filter,
        "incremental_dedup": q_incremental_dedup,
        "corpus_stats": q_corpus_stats,
        "find_table_records": q_find_table_records,
        "codec_cdx": q_codec_cdx,
        "normalize_text": q_normalize_text,
        "ann_ivf": q_ann_ivf,
        "demo_logs_roundtrip": q_demo_logs_roundtrip,
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
        "codec_csv": q_codec_csv,
        "reduce_ends_when": q_reduce_ends_when,
        "reduce_max_events": q_reduce_max_events,
        "reduce_flush_period": q_reduce_flush_period,
        "parse_aws_vpc_flow": q_parse_aws_vpc_flow,
        "parse_aws_alb": q_parse_aws_alb,
        "parse_xml": q_parse_xml,
        "codec_framing_chardelim": q_codec_framing_chardelim,
        "codec_framing_octet": q_codec_framing_octet,
        "codec_netflow_v9": q_codec_netflow_v9,
        "parse_dnstap": q_parse_dnstap,
        "vrl_misc": q_vrl_misc,
        "vrl_hmac": q_vrl_hmac,
        "vrl_uuid_v7": q_vrl_uuid_v7,
        "codec_influxdb": q_codec_influxdb,
        "codec_native_json": q_codec_native_json,
        "datadog_search": q_datadog_search,
        "codec_json": q_codec_json,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def _boilerplate_sql() -> str:
    """DuckDB twin of q_boilerplate_blocks: page build + block split +
    per-block features + context pass, generated from boilerplate.py's
    constants (shared-constant rule — one source of truth)."""
    from vector_spark.datapipe.boilerplate import (
        ANCHOR_PATTERN,
        JUSTEXT_STOPWORDS,
        WS_PATTERN,
    )
    from vector_spark.datapipe.html import (
        BLOCK_TAG_PATTERN,
        DROP_PATTERNS,
        ENTITIES,
        TAG_PATTERN,
    )

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    page = f"{q(_BP_NAV + '<p>' + _BP_LEAD)} || text || {q(' &amp; more</p>' + _BP_TAIL)}"
    for pat in DROP_PATTERNS:
        page = f"regexp_replace({page}, {q(pat)}, '', 'g')"
    txt = "regexp_replace(raw, " + q(TAG_PATTERN) + ", '', 'g')"
    for ent, rep in ENTITIES:
        txt = f"replace({txt}, {q(ent)}, {q(rep)})"
    txt = f"trim(regexp_replace({txt}, {q(WS_PATTERN)}, ' ', 'g'), ' ')"
    lc = (
        "coalesce(list_sum(list_transform("
        f"regexp_extract_all(raw, {q(ANCHOR_PATTERN)}, 1), "
        f"x -> length(regexp_replace(x, {q(TAG_PATTERN)}, '', 'g')))), 0)"
    )
    stops = "[" + ", ".join(q(s) for s in JUSTEXT_STOPWORDS) + "]"
    return f"""
WITH pages AS (SELECT doc_id, string_split_regex({page}, {q(BLOCK_TAG_PATTERN)}) AS b
               FROM documents),
blocks AS (
  SELECT doc_id, unnest(range(0, len(b))) AS block_no, unnest(b) AS raw FROM pages
),
feat AS (
  SELECT doc_id, CAST(block_no AS BIGINT) AS block_no, {txt} AS text,
         CAST({lc} AS BIGINT) AS lc
  FROM blocks
),
scored AS (
  SELECT doc_id, block_no, text,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_words,
         len(list_filter(string_split(text, ' '),
                         x -> x <> '' AND list_contains({stops}, lower(x)))) AS n_stop,
         lc
  FROM feat WHERE length(text) > 0
),
cls AS (
  SELECT doc_id, block_no, text, n_chars, n_words,
         round(CAST(lc AS DOUBLE) / greatest(n_chars, 1), 4) AS link_density,
         round(CAST(n_stop AS DOUBLE) / greatest(n_words, 1), 4) AS stopword_density,
         CASE WHEN CAST(lc AS DOUBLE) / greatest(n_chars, 1) > 0.2 THEN 'bad'
              WHEN n_chars < 70 THEN 'short'
              WHEN CAST(n_stop AS DOUBLE) / greatest(n_words, 1) >= 0.32 THEN
                   CASE WHEN n_chars > 200 THEN 'good' ELSE 'near_good' END
              WHEN CAST(n_stop AS DOUBLE) / greatest(n_words, 1) >= 0.30 THEN 'near_good'
              ELSE 'bad' END AS c
  FROM scored
),
ctx AS (
  SELECT *,
         last_value(CASE WHEN c IN ('good','bad') THEN c END IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY block_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
         first_value(CASE WHEN c IN ('good','bad') THEN c END IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY block_no
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt
  FROM cls
)
SELECT doc_id, block_no, text, n_chars, n_words, link_density, stopword_density,
       CASE WHEN c = 'good' THEN 'good'
            WHEN c = 'bad' THEN 'bad'
            WHEN c = 'near_good' THEN
                 CASE WHEN prev = 'good' OR nxt = 'good' THEN 'good' ELSE 'bad' END
            ELSE CASE WHEN prev = 'good' AND nxt = 'good' THEN 'good' ELSE 'bad' END
       END AS label
FROM ctx
"""


def _hexval_sql(c: str) -> str:
    return f"(CASE WHEN ascii({c}) <= 57 THEN ascii({c}) - 48 ELSE ascii({c}) - 87 END)"


def _simhash_sql(bits: int = 16) -> str:
    votes = []
    for j in range(bits):
        hv = _hexval_sql(f"substr(h, {j + 1}, 1)")
        votes.append(
            f"CASE WHEN list_sum(list_transform(hs, h -> {hv} % 2 * 2 - 1)) > 0 "
            f"THEN {1 << j} ELSE 0 END"
        )
    total = " + ".join(votes)
    return f"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(text, ' ')), t -> md5(t)) AS hs
  FROM documents
)
SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM t
"""


def _minhash_sql(num_hashes: int = 6, band_size: int = 2, threshold: float = 0.5, source: str = "documents") -> str:
    mh_exprs = ",\n         ".join(
        f"list_min(list_transform(sh, s -> md5('{i}|' || s))) AS mh{i}"
        for i in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5(" + " || '|' || ".join(f"mh{b * band_size + j}" for j in range(band_size)) + ")"
        for b in range(num_hashes // band_size)
    )
    return f"""
WITH docs AS (
  SELECT doc_id AS doc,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> array_to_string(string_split(text,' ')[i:i+2], ' ')
         )) AS sh
  FROM {source}
),
mh AS (
  SELECT doc, sh,
         {mh_exprs}
  FROM docs
),
buckets AS (
  SELECT doc, unnest(list_distinct([{band_exprs}])) AS band_key FROM mh
),
cand AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM buckets a JOIN buckets b USING (band_key)
  WHERE a.doc < b.doc
),
pairs AS (
  SELECT doc_a, doc_b, da.sh AS sh_a, db.sh AS sh_b
  FROM cand
  JOIN docs da ON da.doc = cand.doc_a
  JOIN docs db ON db.doc = cand.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(len(list_filter(sh_a, x -> list_contains(sh_b, x))) AS DOUBLE)
             / (len(sh_a) + len(sh_b) - len(list_filter(sh_a, x -> list_contains(sh_b, x)))),
             4) AS jaccard
FROM pairs
WHERE round(CAST(len(list_filter(sh_a, x -> list_contains(sh_b, x))) AS DOUBLE)
            / (len(sh_a) + len(sh_b) - len(list_filter(sh_a, x -> list_contains(sh_b, x)))),
            4) >= {threshold}
"""


def _aggregate_sketch_sql(quantiles=(0.5, 0.9), eps=1.0 / 128,
                          min_value=1e-9) -> str:
    """DuckDB twin of the gamma-bucket DDSketch analogue: identical key
    assignment (6-decimal-rounded log quotient, half-even rounding — spelled
    out as a CASE since DuckDB's round is half-away) and identical agent
    interpolation, but derived with window cumsums + arg_min instead of a
    fold — an independent formulation of the same sketch."""
    import math

    gamma = 1.0 + 2.0 * eps  # exactly representable for eps = 1/128
    lng = repr(math.log(gamma))
    g = repr(gamma)
    # the agent's norm_bias: keeps real-value keys strictly positive so
    # raw key 0 (values near 1.0) can't collide with the zero bucket
    bias = 1 - math.floor(math.log(min_value) / math.log(gamma))

    def rte(x):
        # round-half-to-even (Spark bround / agent round_to_even)
        return (
            f"CAST(floor({x}) + CASE WHEN ({x}) - floor({x}) > 0.5 THEN 1 "
            f"WHEN ({x}) - floor({x}) = 0.5 THEN "
            f"CASE WHEN CAST(floor({x}) AS BIGINT) % 2 = 0 THEN 0 ELSE 1 END "
            f"ELSE 0 END AS BIGINT)"
        )

    qref = f"round(ln(abs(v))/{lng}, 6)"
    key = (
        f"CASE WHEN abs(v) <= {min_value!r} THEN 0 "
        f"WHEN v > 0 THEN {rte(qref)} + {bias} "
        f"ELSE -({rte(qref)} + {bias}) END"
    )
    rank_defs, est_cols = [], []
    for q in quantiles:
        nm = str(q).replace(".", "_")
        rank_defs.append(f"{rte(f'{q!r} * (t.count - 1)')} AS rank_{nm}")
        w = f"((s.cumn - s.rank_{nm}) / CAST(s.cnt AS DOUBLE))"
        est = f"s.lb * {w} + (s.lb * {g}) * (1 - {w})"
        est_cols.append(
            f"round(least(greatest(arg_min({est}, s.k) "
            f"FILTER (WHERE s.cumn > s.rank_{nm}), min(s.mn)), min(s.mx)), 6) "
            f"AS q{nm}"
        )
    return f"""
WITH base AS (
  SELECT (epoch_us(ts) // 604800000000) * 604800 AS window_start, event_type,
         value AS v
  FROM events
),
keyed AS (
  SELECT window_start, event_type, {key} AS k, v FROM base
),
bucketed AS (
  SELECT window_start, event_type, k, count(*) AS cnt
  FROM keyed GROUP BY 1, 2, 3
),
tot AS (
  SELECT window_start, event_type, count(*) AS count, min(v) AS mn, max(v) AS mx,
         CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE) AS sum
  FROM keyed GROUP BY 1, 2
),
cum AS (
  SELECT window_start, event_type, k, cnt,
         CAST(sum(cnt) OVER (PARTITION BY window_start, event_type ORDER BY k)
              AS DOUBLE) AS cumn
  FROM bucketed
),
sel AS (
  SELECT c.window_start, c.event_type, c.k, c.cnt, c.cumn,
         t.count, t.mn, t.mx, t.sum,
         CASE WHEN c.k = 0 THEN 0.0
              WHEN c.k > 0 THEN power({g}, c.k - {bias})
              ELSE -power({g}, (-c.k) - {bias}) END AS lb,
         {', '.join(rank_defs)}
  FROM cum c JOIN tot t USING (window_start, event_type)
)
SELECT s.window_start, s.event_type,
       {', '.join(est_cols)},
       min(s.count) AS count, min(s.sum) AS sum
FROM sel s GROUP BY 1, 2
"""


def _langid_sql() -> str:
    """DuckDB twin of the char-trigram langid: identical 24-trigram literal
    profiles, same lowercase/substr extraction, same round-4 ratio and
    lexicographic tie-break."""
    from vector_spark.datapipe.text import LANG_TRIGRAMS

    langs = sorted(LANG_TRIGRAMS)
    score_exprs = []
    for lang in langs:
        markers = ", ".join("'" + m.replace("'", "''") + "'" for m in LANG_TRIGRAMS[lang])
        score_exprs.append(
            f"CASE WHEN len(tris) > 0 THEN "
            f"round(CAST(len(list_filter(tris, g -> list_contains([{markers}], g))) AS DOUBLE)"
            f" / len(tris), 4) ELSE 0.0 END AS score_{lang}"
        )
    # first (sorted) lang wins ties: strictly greater than earlier langs,
    # greater-or-equal to later ones
    cases = []
    for lang in langs:
        conds = []
        for other in langs:
            if other == lang:
                continue
            op = ">" if other < lang else ">="
            conds.append(f"score_{lang} {op} score_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[0]}' END"
    scores = ",\n         ".join(score_exprs)
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN len(lower(text)) >= 3
              THEN list_transform(generate_series(1, len(lower(text)) - 2),
                                  i -> substr(lower(text), CAST(i AS INTEGER), 3))
              ELSE [] END AS tris
  FROM documents
),
s AS (
  SELECT doc_id,
         {scores}
  FROM t
)
SELECT doc_id, {', '.join('score_' + l for l in langs)}, {case_sql} AS predicted_lang FROM s
"""


def _repetition_sql() -> str:
    """DuckDB twin of repetition_filter_gopher, formulated the opposite
    way on purpose (unnest n-grams -> GROUP BY count -> window-rank top /
    filtered sum) so the hash match is evidence, not an echo."""
    from vector_spark.datapipe.text import GOPHER_DUP_NGRAM_MAX, GOPHER_TOP_NGRAM_MAX

    ctes = [
        "wd AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w,"
        " CAST(len(text) AS BIGINT) AS n_chars FROM documents)"
    ]
    sel = ["wd.doc_id", "wd.n_chars"]
    keep_terms = []
    all_ns = sorted(set(GOPHER_TOP_NGRAM_MAX) | set(GOPHER_DUP_NGRAM_MAX))
    for n in all_ns:
        ctes.append(
            f"g{n} AS (SELECT doc_id, unnest([array_to_string(w[i+1:i+{n}], ' ')"
            f" for i in range(0, greatest(len(w)-{n}+1, 0))]) AS g FROM wd)"
        )
        ctes.append(f"c{n} AS (SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY 1, 2)")
    for n, mx in sorted(GOPHER_TOP_NGRAM_MAX.items()):
        ctes.append(
            f"top{n} AS (SELECT doc_id, c, g FROM ("
            f"SELECT doc_id, c, g, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn"
            f" FROM c{n}) WHERE rn = 1)"
        )
        frac = (
            f"round(coalesce(CASE WHEN top{n}.c >= 2 THEN"
            f" CAST(top{n}.c * len(top{n}.g) AS DOUBLE) / greatest(wd.n_chars, 1)"
            f" ELSE 0.0 END, 0.0), 4)"
        )
        sel.append(f"{frac} AS top_{n}gram_frac")
        sel.append(f"{frac} <= {mx} AS ok_top_{n}gram")
        keep_terms.append(f"{frac} <= {mx}")
    for n, mx in sorted(GOPHER_DUP_NGRAM_MAX.items()):
        ctes.append(
            f"dup{n} AS (SELECT doc_id, sum(c * len(g)) AS dchars FROM c{n}"
            f" WHERE c >= 2 GROUP BY doc_id)"
        )
        frac = (
            f"round(coalesce(CAST(dup{n}.dchars AS DOUBLE) / greatest(wd.n_chars, 1), 0.0), 4)"
        )
        sel.append(f"{frac} AS dup_{n}gram_frac")
        sel.append(f"{frac} <= {mx} AS ok_dup_{n}gram")
        keep_terms.append(f"{frac} <= {mx}")
    joins = "".join(
        f"\nLEFT JOIN top{n} ON top{n}.doc_id = wd.doc_id" for n in sorted(GOPHER_TOP_NGRAM_MAX)
    ) + "".join(
        f"\nLEFT JOIN dup{n} ON dup{n}.doc_id = wd.doc_id" for n in sorted(GOPHER_DUP_NGRAM_MAX)
    )
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT " + ",\n       ".join(sel)
        + f",\n       ({' AND '.join(keep_terms)}) AS keep\nFROM wd" + joins
    )


def _ann_lsh_sql(dims: int = 64, planes: int = 6, k: int = 5) -> str:
    """DuckDB twin of lsh_ann_topk: identical +/-1 plane literals (generated
    by the same make_planes), same rounded sign test, same bucket-restricted
    top-k ordering."""
    from vector_spark.datapipe.similarity import make_planes

    plane_vecs = make_planes(dims, planes)
    sig_terms = []
    for p, plane in enumerate(plane_vecs):
        arr = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        sig_terms.append(
            f"CASE WHEN round(list_dot_product(v, {arr}), 6) > 0 THEN {1 << p} ELSE 0 END"
        )
    sig = " + ".join(sig_terms)
    return f"""
WITH n AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nm
  FROM embeddings
),
b AS (
  SELECT id, v, nm, ({sig}) AS bucket FROM n
),
q AS (SELECT id AS query_id, v AS qv, nm AS qn, bucket FROM b WHERE id IN (0, 1, 2, 3, 4)),
sims AS (
  SELECT q.query_id, b.id AS neighbor_id,
         round(list_dot_product(q.qv, b.v) / (q.qn * b.nm), 6) AS cosine
  FROM b JOIN q ON b.bucket = q.bucket AND b.id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def _near_dup_sql(
    threshold: float, dims: int = 64, bands: int = 4, band_planes: int = 4, seed: int = 7
) -> str:
    """DuckDB twin of the banded-LSH embedding_near_dup_pairs default path:
    identical literal hyperplanes per band (same make_planes seeds), same
    rounded sign test, candidates = agree on ANY band signature, then the
    same rounded-cosine verification."""
    from vector_spark.datapipe.similarity import make_planes

    band_exprs = []
    for b in range(bands):
        terms = []
        for p, plane in enumerate(make_planes(dims, band_planes, seed=seed + 101 * b)):
            arr = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
            terms.append(
                f"CASE WHEN round(list_dot_product(v, {arr}), 6) > 0 THEN {1 << p} ELSE 0 END"
            )
        band_exprs.append("(" + " + ".join(terms) + f") AS s{b}")
    any_band = " OR ".join(f"a.s{b} = b.s{b}" for b in range(bands))
    return f"""
WITH n AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nm
  FROM embeddings
),
s AS (
  SELECT id, v, nm, {", ".join(band_exprs)} FROM n
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM s a JOIN s b ON a.id < b.id AND ({any_band})
)
SELECT c.id_a, c.id_b,
       round(list_dot_product(x.v, y.v) / (x.nm * y.nm), 6) AS cosine
FROM cand c JOIN n x ON x.id = c.id_a JOIN n y ON y.id = c.id_b
WHERE round(list_dot_product(x.v, y.v) / (x.nm * y.nm), 6) >= {threshold}
"""


def _html_text_sql() -> str:
    """DuckDB twin of q_html_text: the page build + the FULL extraction
    chain, generated from vector_spark.datapipe.html's pattern constants
    (the aggregate_sketch shared-constant rule — one source of truth)."""
    from vector_spark.datapipe.html import (
        BLOCK_TAG_PATTERN,
        DROP_PATTERNS,
        ENTITIES,
        HSPACE_PATTERN,
        NEWLINE_PATTERN,
        TAG_PATTERN,
    )

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    expr = (
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
        "'</title><style>p {color: red}</style>"
        "<script>var t = 1 < 2;</script></head>"
        "<body><!-- crawler metadata --><h1>Doc&nbsp;' || "
        "CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
        "'</p><div>tail &amp;lt; end</div></body></html>'"
    )
    for pat in DROP_PATTERNS:
        expr = f"regexp_replace({expr}, {q(pat)}, '', 'g')"
    expr = f"regexp_replace({expr}, {q(BLOCK_TAG_PATTERN)}, chr(10), 'g')"
    expr = f"regexp_replace({expr}, {q(TAG_PATTERN)}, '', 'g')"
    for ent, rep in ENTITIES:
        expr = f"replace({expr}, {q(ent)}, {q(rep)})"
    expr = f"regexp_replace({expr}, {q(HSPACE_PATTERN)}, ' ', 'g')"
    expr = f"regexp_replace({expr}, {q(NEWLINE_PATTERN)}, chr(10), 'g')"
    expr = f"trim({expr}, ' ' || chr(10))"
    return f"""
WITH ext AS (SELECT doc_id, {expr} AS text FROM documents)
SELECT doc_id, text, length(text) AS n_chars,
       CAST(CASE WHEN length(text) = 0 THEN 0
                 ELSE len(string_split(text, chr(10))) END AS INTEGER) AS n_lines
FROM ext
"""


def oracle_sql() -> dict[str, str]:
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
       'counter' AS metric_type, CAST(1.0 AS DOUBLE) AS value
FROM events
UNION ALL
SELECT event_id, 'purchase_value', '', 'incremental', 'counter', value
FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, 'user_gauge', '', 'absolute', 'gauge', CAST(user_id AS DOUBLE)
FROM events
"""

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

    sql["tpch_q1"] = f"""
SELECT l_returnflag, l_linestatus,
       {DSUM_SQL.format(col='l_quantity', alias='sum_qty')},
       {DSUM_SQL.format(col='l_extendedprice', alias='sum_base_price')},
       {DSUM_SQL.format(col='l_extendedprice * (1 - l_discount)', alias='sum_disc_price')},
       {DSUM_SQL.format(col='l_extendedprice * (1 - l_discount) * (1 + l_tax)', alias='sum_charge')},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

    sql["tpch_q3"] = f"""
SELECT o_orderkey,
       {DSUM_SQL.format(col='l_extendedprice * (1 - l_discount)', alias='revenue')}
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

    sql["tpch_q5"] = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

    sql["tpch_q6"] = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

    sql["tpch_q18"] = """
SELECT c_name, c_custkey, o_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       round(o_totalprice, 2) AS o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(25,6))) > 200
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""

    sql["tpch_q4"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""

    sql["tpch_q13"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""

    sql["tpch_q16"] = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000
  )
GROUP BY p_brand, p_type, p_size
"""

    sql["tpch_q22"] = f"""
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       {DSUM_SQL.format(col='c_acctbal', alias='totacctbal')}
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / count(*)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""

    sql["tpch_q2"] = """
WITH cand AS (
  SELECT p_partkey, p_type, s_name, n_name, s_acctbal
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
  JOIN part     ON ps.l_partkey = p_partkey
  JOIN supplier ON ps.l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type
FROM cand c
WHERE s_acctbal = (SELECT max(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

    sql["tpch_q7"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_15' AND n2.n_name = 'NATION_19')
   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_15')
GROUP BY 1, 2, 3
"""

    sql["tpch_q8"] = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(
         CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_21'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN part      ON l_partkey = p_partkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""

    sql["tpch_q9"] = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           - 0.1 * p_retailprice * l_quantity
                           AS DECIMAL(25,6))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""

    sql["tpch_q10"] = """
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) DESC,
         c_custkey
LIMIT 20
"""

    sql["tpch_q11"] = """
WITH base AS (
  SELECT l_partkey, l_extendedprice * (1 - l_discount) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT l_partkey AS ps_partkey,
       CAST(round(sum(CAST(v AS DECIMAL(25,6))), 2) AS DOUBLE) AS value
FROM base
GROUP BY 1
HAVING CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE) >
       (SELECT 1.3 * CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE)
               / count(DISTINCT l_partkey) FROM base)
"""

    sql["tpch_q12"] = """
SELECT l_returnflag AS shipmode,
       CAST(count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS BIGINT) AS high_line_count,
       CAST(count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate
GROUP BY 1
"""

    sql["tpch_q14"] = """
SELECT round(
         100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE),
         6) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-03-01'
"""

    sql["tpch_q15"] = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(round(r, 2) AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT max(r) FROM rev)
"""

    sql["tpch_q17"] = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13' AND p_type = 'MEDIUM'
),
avg_q AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS a
  FROM li GROUP BY 1
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM li JOIN avg_q ON l_partkey = pk
WHERE l_quantity < 0.2 * a
"""

    sql["tpch_q19"] = """
SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""

    sql["tpch_q20"] = """
WITH li AS (
  SELECT l_suppkey, l_partkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
),
sp AS (
  SELECT l_suppkey, l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sq
  FROM li GROUP BY 1, 2
),
tp AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS tq
  FROM li GROUP BY 1
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM sp JOIN tp ON sp.l_partkey = tp.pk WHERE sq > 0.3 * tq
  )
"""

    sql["tpch_q21"] = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM lo l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND l1.late
  AND EXISTS (
    SELECT 1 FROM lo l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lo l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.late
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

    sql["dedup_exact_text"] = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY md5(text)
"""

    sql["dedup_minhash_lsh"] = _minhash_sql()

    # transitive closure over the SAME verified pairs — an independent
    # formulation (recursive CTE) of what Spark computes iteratively
    sql["dedup_clusters"] = f"""
WITH RECURSIVE p AS ({_minhash_sql()}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM p
  UNION ALL
  SELECT doc_b, doc_a FROM p
),
reach(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.lab
),
cc AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM cc
"""

    ladder_pairs = _minhash_sql(source="surv").strip()
    assert ladder_pairs.startswith("WITH ")
    ladder_pairs = ladder_pairs[5:].replace(
        ")\nSELECT doc_a, doc_b,", "),\npairs_out AS (SELECT doc_a, doc_b,", 1
    )
    sql["dedup_ladder"] = f"""
WITH exact AS (
  SELECT min(doc_id) AS doc_id, count(*) AS dup_count
  FROM documents GROUP BY md5(text)
),
surv AS (
  SELECT d.doc_id, d.text FROM exact JOIN documents d USING (doc_id)
),
{ladder_pairs}
),
removed AS (SELECT DISTINCT doc_b AS doc_id FROM pairs_out)
SELECT e.doc_id, e.dup_count
FROM exact e LEFT JOIN removed r USING (doc_id)
WHERE r.doc_id IS NULL
"""
    sql["dedup_simhash"] = _simhash_sql()

    # independent formulation on purpose: DuckDB ranks occurrences with a
    # window (row_number over the span), Spark detects firsts with a
    # groupBy-min + join — same answer, different engines' idioms.
    sql["dedup_spans"] = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
spans AS (
  SELECT doc_id,
         unnest(range(0, greatest(1, CAST(ceil(len(w) / 3.0) AS BIGINT)))) AS span_no,
         unnest([array_to_string(w[i*3+1 : i*3+3], ' ')
                 for i in range(0, greatest(1, CAST(ceil(len(w) / 3.0) AS BIGINT)))]) AS span
  FROM docs
),
ranked AS (
  SELECT doc_id, span_no, span,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, span_no) AS rn
  FROM spans
),
keep AS (SELECT doc_id, span_no, span FROM ranked WHERE rn = 1),
reass AS (
  SELECT doc_id, string_agg(span, ' ' ORDER BY span_no) AS text_dedup,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM keep GROUP BY doc_id
),
base AS (
  SELECT doc_id,
         greatest(1, CAST(ceil(len(string_split(text, ' ')) / 3.0) AS BIGINT)) AS n_spans
  FROM documents
)
SELECT b.doc_id, coalesce(r.text_dedup, '') AS text_dedup, b.n_spans,
       b.n_spans - coalesce(r.n_kept, 0) AS n_removed
FROM base b LEFT JOIN reass r USING (doc_id)
"""

    sql["quality_repetition"] = _repetition_sql()


    # chunk i covers words [i*6+1 .. i*6+8] (1-based inclusive, stride 6);
    # n_chunks collapses to 1 when the doc fits one window
    sql["chunk_documents"] = """
WITH wd AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
nb AS (
  SELECT doc_id, w, len(w) AS n,
         CASE WHEN len(w) <= 8 THEN 1
              ELSE CAST(ceil((len(w) - 2) / 6.0) AS BIGINT) END AS n_chunks
  FROM wd
)
SELECT doc_id,
       unnest(range(0, n_chunks)) AS chunk_id,
       unnest([array_to_string(w[i*6+1 : i*6+8], ' ') for i in range(0, n_chunks)]) AS chunk_text,
       unnest([least(8, n - i*6) for i in range(0, n_chunks)]) AS n_tokens
FROM nb
"""

    sql["quality_gopher"] = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS words,
         len(text) - len(regexp_replace(text, '#|\.\.\.', '', 'g')) AS n_sym
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         round(CAST(list_sum(list_transform(words, w -> len(w))) AS DOUBLE)
               / greatest(len(words), 1), 4) AS avg_word_len,
         round(CAST(n_sym AS DOUBLE) / greatest(len(words), 1), 4) AS symbol_ratio,
         CAST(len(list_filter(words, w -> list_contains(
           ['the','be','to','of','and','that','have','with'], lower(w)))) AS BIGINT)
           AS stopword_hits
  FROM t
)
SELECT doc_id, n_words, avg_word_len, symbol_ratio, stopword_hits,
       n_words >= 20 AND n_words <= 100000 AS ok_word_count,
       avg_word_len >= 3.0 AND avg_word_len <= 10.0 AS ok_word_len,
       symbol_ratio <= 0.1 AS ok_symbols,
       stopword_hits >= 1 AS ok_stopwords,
       (n_words >= 20 AND n_words <= 100000)
         AND (avg_word_len >= 3.0 AND avg_word_len <= 10.0)
         AND symbol_ratio <= 0.1 AND stopword_hits >= 1 AS keep
FROM m
"""

    sql["text_quality"] = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
       round(CAST(len(list_filter(ws, w -> list_contains(['the','a','and','of','to'], w))) AS DOUBLE) / len(ws), 4) AS stopword_ratio,
       round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 4) AS distinct_ratio,
       round(CAST(length(text) - (len(ws) - 1) AS DOUBLE) / len(ws), 4) AS avg_word_len
FROM t
"""

    sql["token_count"] = r"""
SELECT doc_id,
       CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens
FROM documents
"""

    sql["doc_fingerprint"] = """
WITH t AS (
  SELECT doc_id, lower(trim(text)) AS norm FROM documents
)
SELECT doc_id,
       md5(norm) AS content_md5,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(norm, ' '), t -> CAST(ascii(substr(t,1,1)) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007
       ) AS rolling_hash
FROM t
"""

    sql["langid"] = _langid_sql()

    sql["cosine_topk"] = """
WITH base AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (
  SELECT id, v, sqrt(list_dot_product(v, v)) AS nm FROM base
),
q AS (
  SELECT id AS qid, v AS qv, nm AS qn FROM n WHERE id IN (0, 1, 2, 3, 4)
),
sims AS (
  SELECT q.qid AS query_id, n.id AS neighbor_id,
         round(list_dot_product(q.qv, n.v) / (q.qn * n.nm), 6) AS cosine
  FROM n CROSS JOIN q WHERE n.id <> q.qid
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM sims
) WHERE rank <= 5
"""

    # text is ASCII in the fixture, so substr-then-cast equals byte slicing
    sql["multimodal_meta"] = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       lower(hex(CAST(substr(text, 1, 4) AS BLOB))) AS magic,
       CAST(64 + octet_length(CAST(text AS BLOB)) % 577 AS INTEGER) AS fake_width,
       CAST(64 + octet_length(CAST(text AS BLOB)) % 353 AS INTEGER) AS fake_height,
       CAST(octet_length(CAST(text AS BLOB)) % 90000 AS INTEGER) AS fake_duration_ms
FROM documents
"""

    sql["vrl_parse_syslog"] = """
SELECT event_id,
       CAST((event_id % 192) // 8 AS INTEGER) AS facility,
       CAST((event_id % 192) % 8 AS INTEGER) AS severity,
       'host' || CAST(user_id AS VARCHAR) AS hostname,
       'app' || CAST(user_id % 7 AS VARCHAR) AS appname,
       event_id AS procid,
       'event ' || event_type AS message
FROM events
"""

    sql["vrl_parse_grok"] = """
SELECT event_id,
       printf('10.0.%d.%d', user_id % 256, event_id % 256) AS client,
       'GET_' || event_type AS method,
       '/api/u' || CAST(user_id AS VARCHAR) AS path,
       CAST(event_id AS DOUBLE) + 0.5 AS millis
FROM events
"""

    # c_name is 'Customer#000000042'; c_mktsegment a single upper word
    sql["vrl_case_strings"] = """
SELECT c_custkey,
       lower(replace(c_name, '#', '_')) AS snake,
       lower(replace(c_name, '#', '-')) AS kebab,
       upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2)) AS pascal_seg,
       CASE WHEN length(c_name) > 12 THEN substr(c_name, 1, 12) || '...'
            ELSE c_name END AS short_name
FROM customer
"""

    sql["vrl_ip_functions"] = """
WITH t AS (
  SELECT event_id,
         user_id % 128 AS o2, event_id % 256 AS o3, (event_id * 7) % 256 AS o4
  FROM events
)
SELECT event_id,
       printf('10.%d.%d.%d', o2, o3, o4) AS ip,
       10 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_num,
       printf('10.%d.%d.%d', o2, o3, o4) AS ip_roundtrip,
       o2 < 64 AS in_lower_half,
       printf('10.%d.0.0', o2) AS subnet16
FROM t
"""

    sql["vrl_ipv6_functions"] = """
WITH t AS (
  SELECT event_id,
         user_id % 128 AS o2, event_id % 256 AS o3, (event_id * 7) % 256 AS o4,
         user_id % 65536 AS h1, event_id % 65536 AS h2
  FROM events
)
SELECT event_id,
       printf('2001:db8::%x:%x', h1, h2) AS v6,
       printf('2001:0db8:0000:0000:0000:0000:%04x:%04x', h1, h2) AS v6_full,
       printf('::ffff:10.%d.%d.%d', o2, o3, o4) AS mapped,
       printf('10.%d.%d.%d', o2, o3, o4) AS unmapped
FROM t
"""

    sql["vrl_encode"] = """
SELECT doc_id,
       base64(encode(substr(text, 1, 24))) AS head_b64,
       lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
       regexp_replace(text, '[0-9]+', '#', 'g') AS redacted
FROM documents
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

    sql["dedup_ngram_jaccard"] = """
WITH docs AS (
  SELECT doc_id AS doc,
         list_distinct(list_transform(
           generate_series(1, greatest(length(text) - 2, 1)),
           i -> substr(text, i, 3)
         )) AS g
  FROM documents
),
pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, a.g AS g_a, b.g AS g_b
  FROM docs a JOIN docs b ON a.doc < b.doc
),
j AS (
  SELECT doc_a, doc_b,
         round(CAST(len(list_filter(g_a, x -> list_contains(g_b, x))) AS DOUBLE)
               / (len(g_a) + len(g_b) - len(list_filter(g_a, x -> list_contains(g_b, x)))),
               4) AS jaccard
  FROM pairs
)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.6
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

    sql["aggregate_sketch"] = _aggregate_sketch_sql()

    sql["sample_group_modulo"] = """
SELECT event_id, user_id, 20 AS sample_rate FROM (
  SELECT event_id, user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
) WHERE (rn - 1) % 20 = 0
"""

    sql["embedding_near_dup"] = _near_dup_sql(threshold=0.35)

    # tf-idf oracle: same word model, same smoothed idf, same round-6
    # score and (score desc, term) tie-break
    sql["tfidf_keywords"] = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nn AS (SELECT count(*) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(CAST(tf.tf AS DOUBLE)
               * ln((CAST((SELECT n FROM nn) AS DOUBLE) + 1.0) / (CAST(dfq.df AS DOUBLE) + 1.0)),
               6) AS score
  FROM tf JOIN dfq USING (term)
)
SELECT doc_id, rank, term, tf, score FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank
  FROM s
) WHERE rank <= 5
"""

    # BPE merge-round oracle: same lower/whitespace word model, same
    # 1..len-1 adjacent positions, same (count desc, pair asc) ranking
    sql["bpe_pair_counts"] = """
WITH words AS (
  SELECT w, count(*) AS f
  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
        FROM documents)
  GROUP BY w
),
pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 1) AS pair_left,
         substr(w, CAST(i AS INTEGER) + 1, 1) AS pair_right,
         CAST(sum(f) AS BIGINT) AS pair_count
  FROM (SELECT w, f, unnest(range(1, length(w))) AS i FROM words WHERE length(w) >= 2)
  GROUP BY 1, 2
)
SELECT rank, pair_left, pair_right, pair_count FROM (
  SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair_left, pair_right) AS BIGINT) AS rank, *
  FROM pairs
) WHERE rank <= 50
"""

    # SemDeDup oracle: same deterministic centroids (16 lowest vec_ids), same
    # argmax-cosine cluster assignment (tie -> lowest centroid id), same
    # within-cluster lowest-id-survives pruning at rounded cosine >= 0.35
    sql["semantic_dedup"] = """
WITH n AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nm
  FROM embeddings
),
c AS (SELECT id AS cid, v AS cv, nm AS cn FROM n ORDER BY id LIMIT 16),
asg AS (
  SELECT n.id, n.v, n.nm, c.cid,
         round(list_dot_product(n.v, c.cv) / (n.nm * c.cn), 6) AS cs,
         row_number() OVER (
           PARTITION BY n.id
           ORDER BY round(list_dot_product(n.v, c.cv) / (n.nm * c.cn), 6) DESC, c.cid
         ) AS r
  FROM n CROSS JOIN c
),
cells AS (SELECT id, v, nm, cid AS cluster, cs AS cos_centroid FROM asg WHERE r = 1),
dups AS (
  SELECT DISTINCT b.id AS id
  FROM cells a JOIN cells b ON a.cluster = b.cluster AND a.id < b.id
  WHERE round(list_dot_product(a.v, b.v) / (a.nm * b.nm), 6) >= 0.35
)
SELECT c.id AS vec_id, c.cluster, c.cos_centroid, (d.id IS NULL) AS keep
FROM cells c LEFT JOIN dups d ON d.id = c.id
"""

    # IVF-flat oracle: same deterministic centroids (16 lowest vec_ids), same
    # argmax-cosine cell assignment (tie -> lowest centroid id), same
    # 4-probe search, same (cosine desc, id) top-5
    sql["ann_ivf"] = """
WITH n AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nm
  FROM embeddings
),
cents AS (SELECT id AS cid, v AS cv, nm AS cn FROM n ORDER BY id LIMIT 16),
sims AS (
  SELECT n.id, n.v, n.nm, c.cid,
         round(list_dot_product(n.v, c.cv) / (n.nm * c.cn), 6) AS cs,
         row_number() OVER (PARTITION BY n.id ORDER BY round(list_dot_product(n.v, c.cv) / (n.nm * c.cn), 6) DESC, c.cid ASC) AS r
  FROM n CROSS JOIN cents c
),
cells AS (SELECT id, v, nm, cid AS cell FROM sims WHERE r = 1),
probes AS (
  SELECT id AS query_id, cid AS cell FROM sims
  WHERE r <= 4 AND id IN (100, 101, 102)
),
q AS (SELECT id AS query_id, v AS qv, nm AS qn FROM cells WHERE id IN (100, 101, 102)),
cand AS (
  SELECT DISTINCT p.query_id, c.id, c.v, c.nm
  FROM cells c JOIN probes p ON c.cell = p.cell
  WHERE c.id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.id AS neighbor_id,
         round(list_dot_product(q.qv, cand.v) / (q.qn * cand.nm), 6) AS cosine
  FROM cand JOIN q ON cand.query_id = q.query_id
)
SELECT query_id, neighbor_id, rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
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

    sql["parse_aws_vpc_flow"] = """
SELECT event_id,
       2 AS version,
       CAST(user_id AS VARCHAR) AS account_id,
       printf('eni-%d', event_id) AS interface_id,
       printf('10.%d.%d.1', user_id % 128, event_id % 250) AS srcaddr,
       CASE WHEN event_type = 'error' THEN NULL ELSE event_id % 60000 END AS srcport,
       6 AS protocol,
       event_id % 100 AS packets,
       CAST(round(value * 100, 0) AS BIGINT) AS bytes,
       epoch_us(ts) // 1000000 AS start_ts,
       epoch_us(ts) // 1000000 + 60 AS end_ts,
       CASE WHEN event_type = 'error' THEN NULL ELSE 'ACCEPT' END AS action,
       'OK' AS log_status
FROM events
"""

    sql["parse_aws_alb"] = """
SELECT event_id,
       'http' AS type,
       printf('app/lb/%d', user_id) AS elb,
       printf('192.168.1.%d:%d', user_id % 250, event_id % 60000 + 1024) AS client_host,
       NULL AS target_host,
       CAST(printf('0.%03d', event_id % 1000) AS DOUBLE) AS target_processing_time,
       CASE WHEN event_type = 'error' THEN '500' ELSE '200' END AS elb_status_code,
       event_id % 4096 AS received_bytes,
       event_id % 8192 AS sent_bytes,
       'GET' AS request_method,
       printf('http://example.com/u/%d', user_id) AS request_url,
       printf('agent-%d', user_id) AS user_agent,
       NULL AS ssl_cipher,
       printf('Root=1-%d', event_id) AS trace_id
FROM events
"""

    sql["parse_xml"] = """
SELECT event_id, event_id AS xid, user_id AS xuser, event_type AS xtype,
       CAST(printf('%.2f', value) AS DOUBLE) AS xv
FROM events
"""

    sql["codec_framing_chardelim"] = """
SELECT event_id, 0 AS idx, event_type AS frame FROM events
UNION ALL
SELECT event_id, 1, CAST(user_id AS VARCHAR) FROM events
UNION ALL
SELECT event_id, 2, CAST(event_id AS VARCHAR) FROM events
"""

    sql["codec_framing_octet"] = """
SELECT event_id, 0 AS idx, event_type AS frame FROM events
UNION ALL
SELECT event_id, 1, props FROM events
"""

    sql["codec_netflow_v9"] = """
SELECT epoch_us(ts) // 1000000 AS export_time,
       printf('10.%d.%d.%d',
              (event_id // 65536) % 256,
              (event_id // 256) % 256,
              event_id % 256) AS srcaddr,
       printf('192.168.1.%d', event_id % 200 + 1) AS dstaddr,
       event_id % 50000 + 1024 AS srcport,
       CASE WHEN event_id % 2 = 0 THEN 443 ELSE 80 END AS dstport,
       event_id % 1000 + 1 AS packets,
       (event_id % 1000 + 1) * 64 AS octets,
       CASE WHEN event_id % 3 = 0 THEN 17 ELSE 6 END AS proto
FROM events
"""

    sql["parse_dnstap"] = """
SELECT event_id,
  CASE event_id % 4 WHEN 0 THEN 'ClientQuery' WHEN 1 THEN 'ClientResponse'
       WHEN 2 THEN 'ResolverQuery' ELSE 'ForwarderQuery' END AS message_type,
  CAST(CASE event_id % 4 WHEN 0 THEN 5 WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 7 END AS INT)
       AS message_type_id,
  CASE event_id % 4 WHEN 2 THEN 'INET6' ELSE 'INET' END AS socket_family,
  CASE event_id % 4 WHEN 2 THEN 'TCP' ELSE 'UDP' END AS socket_protocol,
  CASE event_id % 4 WHEN 0 THEN '10.0.0.1' WHEN 2 THEN '::1'
       WHEN 3 THEN '192.168.5.5' ELSE NULL END AS source_address,
  CAST(CASE event_id % 4 WHEN 0 THEN 1053 WHEN 2 THEN 2053 WHEN 3 THEN 5353
       ELSE NULL END AS INT) AS source_port,
  CASE event_id % 4 WHEN 1 THEN '10.0.0.2' ELSE NULL END AS response_address,
  CAST(CASE event_id % 4 WHEN 1 THEN 53 ELSE NULL END AS INT) AS response_port,
  CASE event_id % 4 WHEN 0 THEN 1700000000000000011 WHEN 1 THEN 1700000001000000022
       WHEN 2 THEN 1700000002000000033 ELSE 1700000003000000044 END AS time_ns,
  CAST(100 + event_id % 4 AS INT) AS header_id,
  CAST(CASE event_id % 4 WHEN 1 THEN 1 ELSE 0 END AS INT) AS header_qr,
  CASE event_id % 4 WHEN 0 THEN 'a0.example.com.' WHEN 1 THEN 'a1.example.org.'
       WHEN 2 THEN 'a2.example.net.' ELSE 'a3.example.io.' END AS question_name,
  CASE event_id % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'AAAA' WHEN 2 THEN 'TXT'
       ELSE 'MX' END AS question_type,
  'vs-test' AS server_id
FROM events
"""

    sql["codec_influxdb"] = """
SELECT event_id,
       'events' AS measurement,
       event_type AS tag_type,
       user_id AS tag_user,
       CAST(printf('%.2f', value) AS DOUBLE) AS f_value,
       event_id % 100 AS f_n,
       epoch_us(ts) * 1000 AS ts_ns
FROM events
"""

    sql["codec_native_json"] = """
SELECT event_id,
       CASE WHEN event_type = 'purchase' THEN 'metric' ELSE 'log' END AS kind,
       CASE WHEN event_type = 'purchase' THEN NULL ELSE event_type END AS log_etype,
       CASE WHEN event_type = 'purchase' THEN NULL ELSE user_id END AS log_uid,
       CASE WHEN event_type = 'purchase' THEN 'revenue' END AS metric_name,
       CASE WHEN event_type = 'purchase' THEN 'incremental' END AS metric_kind,
       CASE WHEN event_type = 'purchase' THEN CAST(printf('%.2f', value) AS DOUBLE) END AS counter_value
FROM events
"""

    _facilities = (
        "'kern','user','mail','daemon','auth','syslog','lpr','news','uucp',"
        "'cron','authpriv','ftp','ntp','security','console','solaris-cron',"
        "'local0','local1','local2','local3','local4','local5','local6','local7'"
    )

    def _randbits_sql(tag: str) -> str:
        md = f"md5('{tag}|' || CAST(event_id AS VARCHAR))"
        terms = [
            f"CAST({_hexval_sql(f'substr({md}, {i + 1}, 1)')} AS BIGINT) * {16 ** (7 - i)}"
            for i in range(8)
        ]
        return "(" + " + ".join(terms) + ")"

    sql["vrl_misc"] = f"""
WITH t AS (
  SELECT event_id,
         lpad(lower(to_hex(epoch_us(ts) // 1000)), 12, '0') AS ms_hex,
         md5(CAST(event_id AS VARCHAR)) AS h
  FROM events
)
SELECT event_id,
  ['emerg','alert','crit','err','warning','notice','info','debug'][CAST(event_id % 8 AS INT) + 1] AS syslog_level,
  CAST(event_id % 8 AS INT) AS syslog_severity,
  [{_facilities}][CAST(event_id % 24 AS INT) + 1] AS syslog_facility,
  event_id AS parsed_hex,
  TRY_CAST(CAST(event_id AS VARCHAR) || '.5e1' AS DOUBLE) AS parsed_float,
  TRY_CAST('not a number' AS DOUBLE) AS parsed_float_bad,
  lower(to_hex(event_id)) AS formatted_hex,
  CAST({_randbits_sql('ri')} % 100 AS BIGINT) AS rand_int,
  ({_randbits_sql('rb')} % 2 = 0) AS rand_bool,
  substr(ms_hex, 1, 8) || '-' || substr(ms_hex, 9, 4) || '-7' ||
  substr(h, 1, 3) || '-' ||
  substr('89ab', ((strpos('0123456789abcdef', substr(h, 4, 1)) - 1) % 4) + 1, 1) ||
  substr(h, 5, 3) || '-' || substr(h, 8, 12) AS uuid_roundtrip
FROM t
"""

    # VRL type predicates/coercions: identical value-shape derivation,
    # json_valid for is_json, same regexes, same to_bool word table,
    # grouped format composed from integer grouping + exact .25 fraction
    sql["vrl_types"] = r"""
WITH t AS (
  SELECT event_id,
    CASE CAST(event_id % 6 AS INT)
      WHEN 0 THEN '123' WHEN 1 THEN '1.5e2' WHEN 2 THEN '"hi"'
      WHEN 3 THEN '[1,2]' WHEN 4 THEN '{"a":1}' ELSE 'null' END AS v,
    CASE CAST(event_id % 3 AS INT) WHEN 0 THEN '' WHEN 1 THEN ' - ' ELSE 'x' END AS nv,
    CASE CAST(event_id % 5 AS INT)
      WHEN 0 THEN 'yes' WHEN 1 THEN 'NO' WHEN 2 THEN '1'
      WHEN 3 THEN 'false' ELSE 'maybe' END AS bw,
    CASE WHEN event_id % 2 = 0 THEN '2024-01-01 00:00:00' ELSE 'not a time' END AS tstr,
    'evt-' || CAST(event_id % 10 AS VARCHAR) || '-end' AS msg,
    CAST(event_id % 1000 AS DOUBLE) * 1111.0 + 0.25 AS fx
  FROM events
)
SELECT event_id,
  json_valid(v) AS v_is_json,
  regexp_matches(v, '^\s*-?\d+\s*$') AS v_is_int,
  regexp_matches(v, '^\s*-?\d+(\.\d+([eE][+-]?\d+)?|[eE][+-]?\d+)\s*$') AS v_is_float,
  (json_valid(v) AND substr(trim(v), 1, 1) = '"') AS v_is_string,
  (json_valid(v) AND substr(trim(v), 1, 1) = '[') AS v_is_array,
  (json_valid(v) AND substr(trim(v), 1, 1) = '{') AS v_is_object,
  (trim(v) = 'null') AS v_is_null,
  (trim(v) IN ('true', 'false')) AS v_is_bool,
  (TRY_CAST(tstr AS TIMESTAMP) IS NOT NULL) AS v_is_ts,
  (nv IS NULL OR trim(nv) = '' OR trim(nv) = '-') AS v_is_nullish,
  CASE WHEN lower(trim(bw)) IN ('true','t','yes','y','1') THEN TRUE
       WHEN lower(trim(bw)) IN ('false','f','no','n','0') THEN FALSE
       ELSE NULL END AS v_to_bool,
  CASE WHEN regexp_matches(v, '^\s*-?\d+\s*$') THEN TRY_CAST(v AS BIGINT) END AS v_to_int,
  format('{:,}', CAST(floor(fx) AS BIGINT)) || '.' ||
    lpad(CAST(CAST(round((fx - floor(fx)) * 100, 0) AS BIGINT) AS VARCHAR), 2, '0') AS v_fmt,
  (contains(msg, 'evt-') AND contains(msg, '-end')) AS v_contains_all,
  (regexp_matches(msg, 'evt-[0-4]-') OR regexp_matches(msg, 'never')) AS v_match_any,
  (length(nv) = 0) AS v_is_empty,
  TRY_CAST(v AS DOUBLE) AS v_to_float,
  CAST(event_id % 7 AS VARCHAR) AS v_to_string,
  (len(list_filter(string_split(msg, '-'), x -> regexp_matches(x, '^[0-4]$'))) > 0) AS v_match_array
FROM t
"""

    sql["vrl_uuid_v7"] = """
WITH t AS (
  SELECT event_id,
         lpad(lower(to_hex(epoch_us(ts) // 1000)), 12, '0') AS ms_hex,
         md5(CAST(event_id AS VARCHAR)) AS h
  FROM events
)
SELECT event_id,
       substr(ms_hex, 1, 8) || '-' || substr(ms_hex, 9, 4) || '-7' ||
       substr(h, 1, 3) || '-' ||
       substr('89ab', ((strpos('0123456789abcdef', substr(h, 4, 1)) - 1) % 4) + 1, 1) ||
       substr(h, 5, 3) || '-' || substr(h, 8, 12) AS uuid7
FROM t
"""

    sql["codec_csv"] = """
SELECT event_id, event_id AS id, event_type AS etype,
       CAST(printf('%.2f', value) AS DOUBLE) AS v
FROM events
"""

    sql["codec_json"] = """
SELECT event_id, user_id AS u, event_type AS t FROM events
"""

    sql["ann_lsh"] = _ann_lsh_sql()

    # pages_pipeline, demo_logs_roundtrip, multimodal_features, frame_sample:
    # intentionally no oracle (generated input / md5-float + sha1 stubs) ->
    # driver records rows-only checks

    # PII patterns duplicated literally (Java-regex ∩ RE2 subset; see
    # datapipe/text.py::PII_PATTERNS) — counts on the planted original,
    # redaction applied in the same order.
    _pii_text = ("'reach u' || CAST(doc_id AS VARCHAR) || '@mail' || CAST(doc_id % 7 AS VARCHAR)"
                 " || '.com from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
                 " || CAST(doc_id % 100 AS VARCHAR) || ' '"
                 " || CASE WHEN doc_id % 3 = 0 THEN 'ssn 123-45-6789 ' ELSE '' END || text")
    _pii_pats = [
        ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
        ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
        ("phone", r"(?:\+\d{7,15}|\b\d{3}-\d{3}-\d{4})\b", "[PHONE]"),
        ("ccn", r"\b\d{13,16}\b", "[CCN]"),
        ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ]
    _counts = ",\n       ".join(
        "CAST(len(regexp_extract_all(t, '" + p.replace("'", "''") + "')) AS BIGINT) AS n_" + n
        for n, p, _ in _pii_pats
    )
    _red = "t"
    for n, p, r in _pii_pats:
        _red = "regexp_replace(" + _red + ", '" + p.replace("'", "''") + "', '" + r + "', 'g')"
    sql["pii_scrub"] = f"""
WITH planted AS (SELECT doc_id, {_pii_text} AS t FROM documents)
SELECT doc_id,
       {_counts},
       {_red} AS text_redacted
FROM planted
"""

    sql["sample_stratified"] = """
SELECT doc_id, lang, source
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang, source
  ORDER BY md5(lang || '|' || source || '|' || CAST(doc_id AS VARCHAR)), doc_id
) <= 5
"""

    sql["perplexity_bucket"] = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS w
  FROM documents
),
lm AS (SELECT w, count(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT sum(cnt) AS t, count(*) AS v FROM lm),
terms AS (
  SELECT doc_id,
         CAST(round(log10(CAST(cnt + 1 AS DOUBLE)) - log10(CAST(t + v AS DOUBLE)), 6)
              AS DECIMAL(25,6)) AS term
  FROM tok JOIN lm USING (w), tot
),
sc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         round(-(CAST(sum(term) AS DOUBLE)) / count(*), 4) AS nll
  FROM terms GROUP BY 1
)
SELECT d.doc_id,
       coalesce(sc.n_words, 0) AS n_words,
       sc.nll AS nll,
       CASE WHEN sc.nll IS NULL THEN NULL
            WHEN sc.nll <= 1.4765 THEN 'head'
            WHEN sc.nll <= 1.4784 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
"""

    def _md5_u32(arg: str) -> str:
        h = f"md5({arg})"
        return "(" + " + ".join(
            f"CAST({_hexval_sql(f'substr({h}, {i + 1}, 1)')} AS BIGINT) * {16 ** (7 - i)}"
            for i in range(8)
        ) + ")"

    # NFC canonicalization: identical suffix construction (E + combining
    # acute U+0301 and precomposed e-acute U+00E9), DuckDB nfc_normalize
    sql["normalize_text"] = """
SELECT doc_id,
       trim(regexp_replace(
         lower(nfc_normalize(text || '  CAFE' || chr(769) || ' caf' || chr(233))),
         '\\s+', ' ', 'g')) AS text
FROM documents
"""

    # CDXJ parse oracle: ground-truth fields from the same construction
    sql["codec_cdx"] = """
SELECT doc_id,
       'org,example)/p/' || CAST(doc_id AS VARCHAR) AS urlkey,
       '20240101' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0') AS ts,
       'https://example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
       'text/html' AS mime,
       '200' AS status,
       md5(text) AS digest,
       CAST(n_chars AS BIGINT) AS length,
       CAST(doc_id * 100 AS BIGINT) AS offset,
       'crawl-00.warc.gz' AS filename
FROM documents
"""

    # multi-match enrichment: same literal dup-keyed dim, LEFT JOIN fan-out
    sql["find_table_records"] = """
WITH dim(etype, attr, val) AS (
  VALUES ('error', 'sev', 'high'), ('error', 'page', 'oncall'), ('signup', 'sev', 'low')
)
SELECT e.event_id, e.event_type, dim.attr, dim.val
FROM events e LEFT JOIN dim ON dim.etype = e.event_type
"""

    # corpus report: same ROLLUP grouping sets, same whitespace token
    # model, md5-keyed distinct
    sql["corpus_stats"] = r"""
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS tokens,
       CAST(sum(length(text)) AS BIGINT) AS chars,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_texts,
       round(CAST(sum(len(string_split_regex(text, '\s+'))) AS DOUBLE)
             / count(*), 4) AS avg_tokens
FROM documents
GROUP BY ROLLUP (lang, source)
"""

    # incremental dedup: same 4-way split, same md5 exact tier, same
    # minhash band construction as _minhash_sql, delta x corpus bucket
    # join, exact precedence, min corpus id
    _inc_mh = ",\n         ".join(
        f"list_min(list_transform(sh, s -> md5('{i}|' || s))) AS mh{i}" for i in range(6)
    )
    _inc_bands = ", ".join(
        "md5(" + " || '|' || ".join(f"mh{2 * b + j}" for j in range(2)) + ")"
        for b in range(3)
    )
    _inc_sh = """list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> array_to_string(string_split(text,' ')[i:i+2], ' ')
         ))"""
    sql["incremental_dedup"] = f"""
WITH delta AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
cex AS (SELECT md5(text) AS h, min(doc_id) AS ex FROM corpus GROUP BY md5(text)),
ddocs AS (SELECT doc_id AS doc, {_inc_sh} AS sh FROM delta),
cdocs AS (SELECT doc_id AS doc, {_inc_sh} AS sh FROM corpus),
dmh AS (SELECT doc, sh, {_inc_mh} FROM ddocs),
cmh AS (SELECT doc, sh, {_inc_mh} FROM cdocs),
db AS (SELECT doc AS did, unnest(list_distinct([{_inc_bands}])) AS band_key FROM dmh),
cb AS (SELECT doc AS cid, unnest(list_distinct([{_inc_bands}])) AS band_key FROM cmh),
cand AS (SELECT DISTINCT did, cid FROM db JOIN cb USING (band_key)),
ver AS (
  SELECT did, min(cid) AS near
  FROM cand
  JOIN ddocs da ON da.doc = cand.did
  JOIN cdocs dc ON dc.doc = cand.cid
  WHERE round(CAST(len(list_filter(da.sh, x -> list_contains(dc.sh, x))) AS DOUBLE)
              / (len(da.sh) + len(dc.sh) - len(list_filter(da.sh, x -> list_contains(dc.sh, x)))),
              4) >= 0.5
  GROUP BY did
)
SELECT d.doc_id,
       (coalesce(cex.ex, ver.near) IS NULL) AS novel,
       coalesce(cex.ex, ver.near) AS dup_of
FROM delta d
LEFT JOIN cex ON cex.h = md5(d.text)
LEFT JOIN ver ON ver.did = d.doc_id
"""

    # robots.txt politeness gate: identical synthesized content, identical
    # RFC 9309 group/longest-match windows, allow-wins ties
    _ua_re = r"'^\s*[Uu][Ss][Ee][Rr]-[Aa][Gg][Ee][Nn][Tt]\s*:\s*(\S+)'"
    _rule_re = r"'^\s*([Dd][Ii][Ss])?[Aa][Ll][Ll][Oo][Ww]\s*:\s*(\S*)'"
    sql["robots_filter"] = (
        """
WITH hosts AS (SELECT DISTINCT source AS host FROM documents),
rb AS (
  SELECT host,
         'User-agent: *' || chr(10) || 'Disallow: /p' || CAST("""
        + _md5_u32("host")
        + """ % 8 AS VARCHAR)
         || chr(10) || 'Allow: /p' || CAST("""
        + _md5_u32("host")
        + """ % 8 AS VARCHAR) || '/ok'
         || chr(10) || 'Disallow: /w*/x$'
         || chr(10) || 'User-agent: bot' || chr(10) || 'Disallow: /' AS content
  FROM hosts
),
lines AS (
  SELECT host, unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS l
  FROM (SELECT host, string_split_regex(content, '\\r?\\n') AS ls FROM rb)
),
ua AS (
  SELECT host, pos, l, regexp_extract(l, """
        + _ua_re
        + """, 1) AS uav FROM lines
),
g0 AS (
  SELECT *, (uav <> '') AS is_ua,
         coalesce(lag(uav <> '') OVER (PARTITION BY host ORDER BY pos), FALSE) AS prev_ua
  FROM ua
),
g AS (
  SELECT *, sum(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
              OVER (PARTITION BY host ORDER BY pos) AS grp
  FROM g0
),
h AS (
  SELECT *, max(CASE WHEN is_ua AND lower(uav) = '*' THEN 1 ELSE 0 END)
              OVER (PARTITION BY host, grp) AS has_star
  FROM g
),
rules AS (
  SELECT DISTINCT host,
         regexp_extract(l, """
        + _rule_re
        + """, 2) AS rule,
         (regexp_extract(l, """
        + _rule_re
        + """, 1) = '') AS allow
  FROM h
  WHERE has_star = 1 AND NOT is_ua AND regexp_extract(l, """
        + _rule_re
        + """, 2) <> ''
),
urls AS (
  SELECT doc_id, source AS host,
         CASE WHEN doc_id % 5 = 0 THEN '/w' || CAST(doc_id % 4 AS VARCHAR) || '/x'
              WHEN doc_id % 5 = 1 THEN '/w' || CAST(doc_id % 4 AS VARCHAR) || '/xy'
              ELSE '/p' || CAST(doc_id % 8 AS VARCHAR)
                   || CASE WHEN doc_id % 3 = 0 THEN '/ok/x' ELSE '/y' END END AS path
  FROM documents
),
rx AS (
  SELECT host, rule, allow,
         replace(regexp_replace(rule, '([\\\\.\\[\\]\\{\\}\\(\\)\\^\\$\\+\\?\\|])', '\\\\\\1', 'g'), '*', '.*') AS esc
  FROM rules
),
rx2 AS (
  SELECT host, rule, allow,
         CASE WHEN rule LIKE '%$' THEN '^' || substr(esc, 1, length(esc) - 2) || '$'
              ELSE '^' || esc END AS pat
  FROM rx
),
cand AS (
  SELECT u.doc_id, u.host, u.path, r.rule, r.allow,
         (r.rule IS NOT NULL AND regexp_matches(u.path, r.pat)) AS m
  FROM urls u LEFT JOIN rx2 r USING (host)
),
top AS (
  SELECT *, row_number() OVER (
    PARTITION BY host, doc_id ORDER BY m DESC, length(rule) DESC, allow DESC, rule
  ) AS rn FROM cand
)
SELECT doc_id, host, path, CASE WHEN m THEN allow ELSE TRUE END AS allowed
FROM top WHERE rn = 1
"""
    )

    # fixed-point integer PageRank: identical md5-derived 4-regular edges,
    # identical floor-division update, 3 unrolled rounds -> bit-exact
    _pr_edges = " UNION ALL ".join(
        "SELECT doc_id AS src, CAST("
        + _md5_u32("'pr|' || CAST(doc_id AS VARCHAR) || '|%d'" % j)
        + " % (SELECT n FROM nn) AS BIGINT) AS dst FROM documents"
        for j in range(4)
    )
    _pr_iter = """
{out} AS (
  SELECT nodes.id,
         CAST(15 * (1000000000000 // (SELECT n FROM nn)) // 100
              + 85 * coalesce(f.s, 0) // 100 AS BIGINT) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, sum({prev}.r // 4) AS s
    FROM e JOIN {prev} ON {prev}.id = e.src GROUP BY e.dst
  ) f ON f.id = nodes.id
)"""
    sql["pagerank"] = (
        f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
nodes AS (SELECT doc_id AS id FROM documents),
e AS ({_pr_edges}),
r0 AS (SELECT id, CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS r FROM nodes),"""
        + ",".join(
            _pr_iter.format(out=f"i{k}", prev=f"i{k - 1}" if k > 1 else "r0")
            for k in (1, 2, 3)
        )
        + "\nSELECT id AS doc_id, r AS pagerank FROM i3\n"
    )

    def _classifier_sql(source: str = "documents") -> str:
        return f"""
WITH wts AS (
  SELECT CAST(i AS BIGINT) AS bucket,
         CAST({_md5_u32("'w|' || CAST(i AS VARCHAR)")} % 2001 AS DOUBLE) / 1000.0 - 1.0
           AS weight
  FROM generate_series(0, 4095) AS t(i)
),
feats AS (
  SELECT doc_id,
         unnest(list_concat(
           toks,
           CASE WHEN len(toks) >= 2
                THEN list_transform(generate_series(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i + 1])
                ELSE [] END
         )) AS f
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
        FROM {source})
),
fb AS (SELECT doc_id, {_md5_u32("f")} % 4096 AS bucket FROM feats),
sc AS (
  SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_features,
         sum(CAST(round(coalesce(w.weight, 0.0), 6) AS DECIMAL(25,6))) AS s
  FROM fb LEFT JOIN wts w USING (bucket) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(sc.n_features, 0) AS n_features,
       round(1.0 / (1.0 + exp(-(0.0 + CAST(sc.s AS DOUBLE) / sc.n_features))), 6) AS score,
       coalesce(round(1.0 / (1.0 + exp(-(0.0 + CAST(sc.s AS DOUBLE) / sc.n_features))), 6)
                >= 0.5, FALSE) AS keep
FROM {source} d LEFT JOIN sc USING (doc_id)
"""

    sql["quality_classifier"] = _classifier_sql()

    def _mixture_budget_sql(budgets: dict, source: str = "documents") -> str:
        case = " ".join(
            f"WHEN '{g}' THEN {b}" for g, b in budgets.items()
        )
        return f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)
           AS n_tokens,
         md5('mix|' || CAST(doc_id AS VARCHAR)) AS h,
         CASE lang {case} END AS budget
  FROM {source}
),
c AS (
  SELECT doc_id, lang, n_tokens, budget,
         sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM t WHERE budget IS NOT NULL
)
SELECT doc_id, lang, n_tokens FROM c WHERE cum <= budget
"""

    sql["mixture_sample"] = _mixture_budget_sql(
        {"en": 4000, "de": 1500, "es": 2000, "zh": 100}
    )

    _dsir_hex = "md5('dsir|' || CAST(doc_id AS VARCHAR))"
    _dsir_val = "(" + " + ".join(
        f"CAST({_hexval_sql(f'substr({_dsir_hex}, {i + 1}, 1)')} AS BIGINT) * {16 ** (7 - i)}"
        for i in range(8)
    ) + ")"
    sql["dsir_resample"] = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w
  FROM documents
),
tgt AS (SELECT w, count(*) AS tc FROM tok WHERE doc_id % 7 = 0 GROUP BY 1),
src AS (SELECT w, count(*) AS sc FROM tok GROUP BY 1),
ttot AS (SELECT sum(tc) AS tt, count(*) AS tv FROM tgt),
stot AS (SELECT sum(sc) AS st, count(*) AS sv FROM src),
terms AS (
  SELECT tok.doc_id,
         CAST(round(
           (log10(CAST(coalesce(tg.tc, 0) + 1 AS DOUBLE)) - log10(CAST(tt + tv AS DOUBLE)))
           - (log10(CAST(coalesce(sr.sc, 0) + 1 AS DOUBLE)) - log10(CAST(st + sv AS DOUBLE))),
         6) AS DECIMAL(25,6)) AS term
  FROM tok LEFT JOIN tgt tg USING (w) LEFT JOIN src sr USING (w), ttot, stot
),
wt AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(term) AS DOUBLE) AS lr
  FROM terms GROUP BY 1
)
SELECT doc_id, n_words, round(lr, 4) AS log_ratio,
       round(lr / 2.0 - ln(-ln(({_dsir_val} + 0.5) / 4294967296.0)), 6) AS sample_key
FROM wt
ORDER BY sample_key DESC, doc_id
LIMIT 200
"""

    sql["html_text"] = _html_text_sql()
    sql["boilerplate_blocks"] = _boilerplate_sql()

    sql["codec_warc"] = """
SELECT event_id, 0 AS idx, 'response' AS warc_type,
       'https://crawl.example/' || CAST(event_id AS VARCHAR) AS target_uri,
       epoch_us(date_trunc('second', ts)) AS warc_date_us,
       'urn:uuid:id-' || CAST(event_id AS VARCHAR) AS record_id,
       'application/json' AS content_type,
       CAST(strlen(props) AS BIGINT) AS content_length,
       props AS payload
FROM events
UNION ALL
SELECT event_id, 1, 'metadata', NULL, NULL, NULL, NULL,
       CAST(strlen(event_type) AS BIGINT), event_type
FROM events
"""

    sql["url_filter"] = """
WITH parts AS (
  SELECT doc_id,
         CASE WHEN (doc_id // 2) % 3 = 0 THEN 'https' ELSE 'http' END AS scheme,
         'www.site' || CAST((doc_id // 2) % 13 AS VARCHAR)
           || CASE WHEN (doc_id // 2) % 4 = 0 THEN '.co.uk' ELSE '.com' END AS host,
         CASE WHEN doc_id % 2 = 1
              THEN CASE WHEN (doc_id // 2) % 3 = 0 THEN '443' ELSE '80' END
              WHEN doc_id % 7 = 0 THEN '8080' ELSE '' END AS rawport,
         CASE WHEN (doc_id // 2) % 5 = 0 THEN '/'
              ELSE '/p/' || CAST((doc_id // 2) % 9 AS VARCHAR) END AS path,
         CASE WHEN doc_id % 3 = 0 THEN 'utm_source=feed&b=2&a=1'
              WHEN doc_id % 3 = 1 THEN 'b=2&a=1&gclid=x'
              ELSE '' END AS q
  FROM documents
),
norm AS (
  SELECT doc_id, scheme, host,
         CASE WHEN rawport = (CASE WHEN scheme = 'https' THEN '443' ELSE '80' END)
              THEN '' ELSE rawport END AS port,
         CASE WHEN path = '/' THEN '' ELSE path END AS npath,
         list_sort(list_filter(string_split(q, '&'),
           p -> p <> ''
                AND NOT starts_with(split_part(p, '=', 1), 'utm_')
                AND split_part(p, '=', 1) NOT IN ('gclid','fbclid','msclkid','mc_cid','mc_eid')
         )) AS kept,
         string_split(host, '.') AS labels
  FROM parts
),
flat AS (
  SELECT doc_id, host,
         scheme || '://' || host
           || CASE WHEN port <> '' THEN ':' || port ELSE '' END
           || npath
           || CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END
           AS url_norm,
         CASE WHEN len(labels) >= 3 AND length(labels[-1]) = 2
                   AND labels[-2] IN ('co','com','net','org','gov','ac','edu')
              THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
              WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
              ELSE host END AS domain
  FROM norm
)
SELECT doc_id, url_norm, host, domain,
       domain IN ('site3.com', 'site7.co.uk') AS blocked,
       row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) = 1 AS is_canonical
FROM flat
"""

    sql["decontaminate"] = """
WITH wd AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
  FROM documents
),
docs AS (
  SELECT doc_id, list_distinct(
    [array_to_string(w[i+1:i+4], ' ') for i in range(0, greatest(len(w)-4+1, 0))]
  ) AS g
  FROM wd
),
bench AS (SELECT DISTINCT unnest(g) AS bg FROM docs WHERE doc_id % 101 = 7),
hits AS (
  SELECT e.doc_id, count(*) AS n_hits
  FROM (SELECT doc_id, unnest(g) AS g FROM docs) e
  JOIN bench b ON b.bg = e.g
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(len(d.g) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / greatest(len(d.g), 1), 4) AS contam_frac,
       round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / greatest(len(d.g), 1), 4) <= 0.0 AS keep
FROM docs d LEFT JOIN hits h ON h.doc_id = d.doc_id
"""

    _shard_hex = "md5('42:' || CAST(doc_id AS VARCHAR))"
    _shard_val = "(" + " + ".join(
        f"CAST({_hexval_sql(f'substr({_shard_hex}, {i + 1}, 1)')} AS BIGINT) * {16 ** (7 - i)}"
        for i in range(8)
    ) + ")"
    sql["shuffle_corpus"] = f"""
SELECT doc_id, text, lang, source, n_chars,
       {_shard_val} % 8 AS shard,
       CAST(row_number() OVER (
         PARTITION BY {_shard_val} % 8
         ORDER BY {_shard_hex}, doc_id
       ) AS BIGINT) AS pos
FROM documents
"""

    # same seed-42 order as shuffle_corpus; integer chunking arithmetic
    def _pack_sql(source: str = "documents") -> str:
        return f"""
WITH t AS (
  SELECT doc_id, {_shard_val} % 8 AS shard, {_shard_hex} AS h,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) + 1
              AS BIGINT) AS n
  FROM {source}
),
c AS (
  SELECT doc_id, shard, n,
         CAST(sum(n) OVER (PARTITION BY shard ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS e
  FROM t
),
s AS (
  SELECT doc_id, shard, e - n AS st, e,
         unnest(range((e - n) // 64, (e - 1) // 64 + 1)) AS seq_no
  FROM c
)
SELECT shard, seq_no, doc_id,
       greatest(st, seq_no * 64) - st AS doc_offset,
       greatest(st, seq_no * 64) - seq_no * 64 AS seq_offset,
       least(e, (seq_no + 1) * 64) - greatest(st, seq_no * 64) AS n_tokens
FROM s
"""

    sql["pack_sequences"] = _pack_sql()

    # the composed corpus build: every stage's oracle re-rooted onto the
    # previous stage's survivors (dedup -> classifier gate -> mixture ->
    # packing), exactly the Spark composition in corpus.py::corpus_build
    sql["corpus_build"] = f"""
WITH surv AS (
  SELECT d.* FROM documents d
  JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)) sv USING (doc_id)
),
cls AS ({_classifier_sql("surv")}),
kept AS (SELECT s.* FROM surv s JOIN cls ON cls.doc_id = s.doc_id AND cls.keep),
mix AS ({_mixture_budget_sql({"en": 3000, "de": 1200, "es": 1500, "fr": 1500, "zh": 1500}, "kept")}),
sampled AS (SELECT k.* FROM kept k JOIN mix ON mix.doc_id = k.doc_id),
packed AS ({_pack_sql("sampled")})
SELECT * FROM packed
"""

    # composed curation oracle: quality + repetition as gating joins, the
    # span-dedup SQL re-rooted onto the gated subset (dedup after gating,
    # same as the Spark plan), langid joined row-locally.
    _spans_gated = sql["dedup_spans"].replace("FROM documents", "FROM gated")
    assert _spans_gated.count("FROM gated") == 2
    sql["curation_pipeline"] = f"""
WITH gated AS (
  SELECT d.doc_id, d.text, q.n_words
  FROM documents d
  JOIN ({sql['quality_gopher']}) q ON q.doc_id = d.doc_id AND q.keep
  JOIN ({sql['quality_repetition']}) r ON r.doc_id = d.doc_id AND r.keep
),
sp AS ({_spans_gated}),
surv AS (SELECT * FROM sp WHERE n_removed <= 0.5 * n_spans)
SELECT g.doc_id, l.predicted_lang, g.n_words, s.n_spans, s.n_removed, s.text_dedup
FROM surv s
JOIN gated g ON g.doc_id = s.doc_id
JOIN ({sql['langid']}) l ON l.doc_id = g.doc_id
"""

    # crawl -> corpus oracle: the WARC trip is lossless, so the expected
    # route assignment composes the same quality/langid fragments straight
    # over documents (exclusive first-match-wins as a CASE chain).
    sql["crawl_pipeline"] = f"""
SELECT d.doc_id,
       CAST(strlen(d.text) AS BIGINT) AS content_length,
       q.n_words,
       l.predicted_lang,
       CASE WHEN NOT q.keep THEN 'rejected_quality'
            WHEN l.predicted_lang <> 'en' THEN 'rejected_lang'
            ELSE 'corpus' END AS route
FROM documents d
JOIN ({sql['quality_gopher']}) q ON q.doc_id = d.doc_id
JOIN ({sql['langid']}) l ON l.doc_id = d.doc_id
"""

    return sql
