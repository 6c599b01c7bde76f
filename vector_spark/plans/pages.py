"""The north-rule pipeline: parse -> enrich -> route -> aggregate over
Common-Crawl-style pages (url, warc_ts, html, text, lang).

Emulates the reference topology syslog -> remap(parse_regex) ->
route -> aggregate (regression/cases/syslog_regex_logs2metric_ddmetrics and
splunk_hec_route_s3, see BASELINE.md) re-expressed Spark-first:

  parse    = JVM-side column expressions over the html bytes (regexp_extract
             on the decoded header slice) — whole-stage codegen, no Python.
             The `text` column is NEVER touched: byte-identical passthrough
             is a checked invariant (BASELINE.json input_hint).
  enrich   = broadcast hash joins on tld and lang (no shuffle of the fact).
  route    = multi-match conditions -> per-sink filters (route.rs semantics).
  aggregate= tumbling event-time window counts + byte totals per
             (route, geo_region) — two-phase by construction (partial agg
             map-side), with optional salting for the hot-domain skew.

Scale levers (all active):
  * url-hash repartitioning: repartition(pmod(xxhash64(url), N)) gives a
    uniform layout regardless of crawl order / hot domains.
  * AQE skew-join + partition coalescing (session.py).
  * salted two-phase aggregation for the domain rollup (hot domain0 ~10%
    of rows): group on (salt, domain) then re-group on domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..operators.aggregate import tumbling_window
from ..operators.route import route_array, routed_union

# pseudo-route name for the fused single-pass plan's domain-rollup rows
DOMAINS_PSEUDO_ROUTE = "_domains"

PAGE_ROUTES = {
    "errors": "status >= 500",
    "redirects": "status >= 300 AND status < 400",
    "ok_en": "status = 200 AND lang = 'en'",
    "other_ok": "status = 200 AND lang <> 'en'",
}


def parse_pages(pages: DataFrame) -> DataFrame:
    """remap/parse stage: extract domain, tld, status, content_type, title
    from url/html. Mirrors Vector's remap + parse_regex
    (/root/reference/src/transforms/remap.rs) as pure column exprs."""
    # invalid UTF-8 byte runs (real-web reality; 1% of fixture rows) must
    # decode to replacement chars, not raise
    pages.sparkSession.conf.set("spark.sql.legacy.codingErrorAction", "true")
    head = F.decode(F.substring(F.col("html"), 1, 256), "UTF-8")
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return pages.select(
        "*",
        host.alias("domain"),
        F.substring_index(host, ".", -1).alias("tld"),
        F.regexp_extract(head, r'status" content="(\d+)"', 1).cast("int").alias("status"),
        F.regexp_extract(head, r'content-type="([^"]+)"', 1).alias("content_type"),
        F.regexp_extract(head, r"<title>([^<]*)</title>", 1).alias("title"),
        F.length(F.col("html")).alias("html_bytes"),
    )


def pages_pipeline(
    pages: DataFrame,
    geo_dim: DataFrame,
    lang_dim: DataFrame,
    window_secs: int = 3600,
    salt_buckets: int = 16,
    repartition_by_url: int | None = None,
) -> dict[str, DataFrame]:
    """Full parse -> enrich -> route -> aggregate plan.

    Returns {"routed": rows with `route` col (one per matching route),
             "sink_counts": per-route x window x geo_region aggregate,
             "domain_rollup": salted two-phase hot-domain aggregate,
             "fused_sinks": BOTH aggregates from one scan/parse/shuffle —
             sink_counts rows carry domain NULL, the domain rollup rides
             the '_domains' pseudo-route with window/geo NULL}.
    """
    if repartition_by_url:
        # deterministic layout at 10^12 rows: uniform url-hash partitioning
        pages = pages.repartition(repartition_by_url, F.pmod(F.xxhash64("url"), F.lit(repartition_by_url)))

    parsed = parse_pages(pages)
    enriched = (
        parsed.join(broadcast(geo_dim), "tld", "left")
        .join(broadcast(lang_dim), "lang", "left")
    )
    routed = routed_union(enriched, PAGE_ROUTES)

    sink_counts = routed.groupBy(
        F.col("route"),
        tumbling_window(F.col("warc_ts"), window_secs).alias("window_start"),
        F.col("geo_region"),
    ).agg(
        F.count(F.lit(1)).alias("events"),
        F.sum("html_bytes").alias("bytes"),
    )

    # salted two-phase aggregate: phase 1 groups on (domain, salt) spreading
    # the hot domain across `salt_buckets` reducers; phase 2 merges partials.
    salt = F.pmod(F.xxhash64("url"), F.lit(salt_buckets)).alias("_salt")
    partial = parsed.groupBy("domain", salt).agg(
        F.count(F.lit(1)).alias("_cnt"), F.sum("html_bytes").alias("_bytes")
    )
    domain_rollup = partial.groupBy("domain").agg(
        F.sum("_cnt").alias("pages"), F.sum("_bytes").alias("bytes")
    )

    # single-pass fan-out: Vector's topology taps ONE stream into every
    # sink, so a faithful Spark plan should not re-scan and re-parse the
    # fact table once per sink (two separate actions do, and AQE never
    # reuses identical deterministic shuffle subtrees — BASELINE.md
    # round-4 curation note). Each event explodes into its matching-route
    # copies plus one '_domains' copy; a single partial-agg + ONE Exchange
    # then serves both the per-sink windowed counts and the domain rollup.
    # The hot-domain key needs no salt on this path: map-side partial
    # aggregation bounds each reducer's input to (#tasks) partials per
    # domain, the same argument as the salted twin above it verifies.
    all_routes = F.concat(
        route_array(PAGE_ROUTES), F.array(F.lit(DOMAINS_PSEUDO_ROUTE))
    )
    is_dom = F.col("route") == DOMAINS_PSEUDO_ROUTE
    fused_sinks = (
        enriched.withColumn("route", F.explode(all_routes))
        .groupBy(
            "route",
            F.when(is_dom, F.col("domain")).alias("domain"),
            F.when(~is_dom, tumbling_window(F.col("warc_ts"), window_secs)).alias("window_start"),
            F.when(~is_dom, F.col("geo_region")).alias("geo_region"),
        )
        .agg(F.count(F.lit(1)).alias("events"), F.sum("html_bytes").alias("bytes"))
    )

    return {
        "routed": routed,
        "sink_counts": sink_counts,
        "domain_rollup": domain_rollup,
        "fused_sinks": fused_sinks,
    }
