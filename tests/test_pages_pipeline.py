"""North-rule pipeline invariants (BASELINE.json): byte-identical extracted
text per url, routed-row set equality per sink, deterministic results at any
parallelism, hot-domain rollup correctness."""

from pyspark.sql import functions as F

from vector_spark.plans import pages_pipeline
from vector_spark.plans.pages import parse_pages, PAGE_ROUTES
from vector_spark.sources import generate_pages, geo_dim, lang_dim
from vector_spark.operators import route

N = 3000


def test_generator_partition_invariant(spark):
    """Same rows at any partitioning — the resumability precondition."""
    a = generate_pages(spark, 500, partitions=1)
    b = generate_pages(spark, 500, partitions=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_text_byte_identical_passthrough(spark):
    """Pipeline must never touch `text`: byte-identical per url."""
    pages = generate_pages(spark, N, partitions=4)
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))["routed"]
    joined = (
        out.select("url", F.col("text").alias("text_out"))
        .dropDuplicates(["url"])
        .join(pages.select("url", "text"), "url")
    )
    assert joined.filter(F.col("text_out") != F.col("text")).count() == 0
    assert joined.count() == pages.select("url").distinct().count()


def test_routed_row_equality_per_sink(spark):
    """Routed rows == independently filtered rows, per sink (set equality —
    the BASELINE.json verification invariant)."""
    pages = generate_pages(spark, N, partitions=4)
    parsed = parse_pages(pages)
    routed = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))["routed"]
    for name, cond in PAGE_ROUTES.items():
        expect = set(r.url for r in parsed.filter(cond).select("url").collect())
        got = set(r.url for r in routed.filter(F.col("route") == name).select("url").collect())
        assert got == expect, f"sink {name}: {len(got)} vs {len(expect)}"


def test_sink_counts_match_routed(spark):
    pages = generate_pages(spark, N, partitions=4)
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))
    agg_total = out["sink_counts"].agg(F.sum("events")).collect()[0][0]
    assert agg_total == out["routed"].count()


def test_domain_rollup_two_phase_equals_direct(spark):
    """Salted two-phase aggregate must equal the direct groupBy."""
    pages = generate_pages(spark, N, partitions=4)
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))
    direct = (
        parse_pages(pages).groupBy("domain")
        .agg(F.count(F.lit(1)).alias("pages"), F.sum("html_bytes").alias("bytes"))
    )
    assert out["domain_rollup"].exceptAll(direct).count() == 0
    assert direct.exceptAll(out["domain_rollup"]).count() == 0


def test_parse_extracts_status_and_domain(spark):
    pages = generate_pages(spark, 200, partitions=2)
    parsed = parse_pages(pages)
    assert parsed.filter(F.col("status").isNull()).count() == 0
    assert parsed.filter(~F.col("status").isin(200, 301, 404, 500, 503)).count() == 0
    assert parsed.filter(~F.col("domain").startswith("domain")).count() == 0
    # title parse survives the 1% invalid-UTF8 tail rows (decode replaces)
    assert parsed.filter(F.col("title") == "").count() == 0


def test_pipeline_deterministic_across_parallelism(spark):
    """Identical sink_counts at different partitioning — the local stand-in
    for the N vs 4N cluster-equivalence requirement."""
    a = pages_pipeline(generate_pages(spark, N, partitions=2), geo_dim(spark), lang_dim(spark))
    b = pages_pipeline(generate_pages(spark, N, partitions=16), geo_dim(spark), lang_dim(spark))
    key = lambda t: tuple(map(str, t))
    ra = sorted(map(tuple, a["sink_counts"].collect()), key=key)
    rb = sorted(map(tuple, b["sink_counts"].collect()), key=key)
    assert ra == rb


def _warc_record(wtype, uri, payload, extra=""):
    body = payload.encode("utf-8")
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"{extra}Content-Length: {len(body)}\r\n\r\n{payload}\r\n\r\n"
    )


def test_crawl_pipeline_routes_and_html_path(spark):
    """End-to-end crawl topology: a 'response' record goes through HTML
    extraction before gating, a 'conversion' (WET) record passes its
    payload through verbatim, junk routes to rejected_quality, a German
    page to rejected_lang, and the rollup counts agree with the routed
    rows. warcinfo records drop out before curation."""
    from vector_spark.plans import crawl_pipeline

    good = (
        "the quick brown fox jumps over the lazy dog and the cat sat "
        "with the happy children while the sun was high and the wind "
        "kept the trees moving all day long in the quiet town"
    )
    # "the" keeps the (English) Gopher stopword gate satisfied so the doc
    # reaches the LANGUAGE gate — quality rejection wins the route order
    german = (
        "der schnelle braune fuchs springt und die katze sitzt mit den "
        "kindern in der sonne und der wind bewegt die alten schoenen "
        "gruenen lindenbaeume der kleinen ruhigen stadt den ganzen tag "
        "und die leute sind mit der welt the und dem leben zufrieden"
    )
    html = f"<html><head><script>var x=1;</script></head><body><p>{good}</p></body></html>"
    buf = (
        _warc_record("warcinfo", "meta:none", "software: test")
        + _warc_record("response", "http://a.example/1", html)
        + _warc_record("conversion", "http://b.example/2", good)
        + _warc_record("conversion", "http://c.example/3", "### ### ###")
        + _warc_record("conversion", "http://d.example/4", german)
    )
    out = crawl_pipeline(
        spark.createDataFrame([(buf,)], "buf string"),
        quality={"min_words": 20, "min_stopword_hits": 1},
    )
    cur = {r.target_uri: r for r in out["curated"].collect()}
    assert len(cur) == 4  # warcinfo excluded
    assert cur["http://a.example/1"].route == "corpus"
    assert cur["http://a.example/1"].text == good  # html stripped to the prose
    assert cur["http://b.example/2"].route == "corpus"
    assert cur["http://c.example/3"].route == "rejected_quality"
    assert cur["http://d.example/4"].route == "rejected_lang"
    assert cur["http://d.example/4"].predicted_lang == "de"
    counts = {(r.route, r.predicted_lang): r.docs for r in out["route_counts"].collect()}
    assert counts[("corpus", "en")] == 2
    assert sum(counts.values()) == 4


def test_events_reshape_flagship_twins(spark):
    """The oracle-checked flagship twins (entry_queries.datapipe
    q_pages_routed / q_pages_sink_counts): multi-match copy + _unmatched
    semantics and the byte-identical text passthrough hold on the
    events-reshaped corpus exactly as on the generated one."""
    from entry_queries.datapipe import (
        _events_as_pages,
        q_pages_routed,
        q_pages_sink_counts,
    )

    sf = "/root/testdata/sf0.001"
    pages = _events_as_pages(spark, sf)
    routed = q_pages_routed(spark, sf)

    # text passthrough: every routed row's text is the raw props string
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        F.concat(F.lit("/p/"), F.col("event_id").cast("string")).alias("path"),
        F.coalesce("props", F.lit("")).alias("props"),
    )
    joined = routed.join(ev, F.col("url").endswith(F.col("path")), "left")
    # null-safe: a missed join must fail the check, not vacuously pass it
    assert joined.filter(F.col("props").isNull()).count() == 0
    bad = joined.filter(~F.col("text").eqNullSafe(F.col("props"))).count()
    assert bad == 0

    by_route = {r["route"]: r["n"] for r in routed.groupBy("route").agg(F.count("*").alias("n")).collect()}
    assert set(by_route) == {"errors", "redirects", "ok_en", "other_ok", "_unmatched"}
    # every input event routed at least once; 404s land in _unmatched only
    assert routed.select("url").distinct().count() == pages.count()
    assert (
        routed.filter((F.col("status") == 404) & (F.col("route") != "_unmatched")).count() == 0
    )
    # aggregate events total == routed rows total (per-sink counts complete)
    agg_total = q_pages_sink_counts(spark, sf).agg(F.sum("events")).collect()[0][0]
    assert agg_total == routed.count()


def test_fused_sinks_single_pass_equals_split(spark):
    """fused_sinks must reproduce sink_counts and domain_rollup exactly,
    from ONE scan/parse/shuffle (exactly one Exchange hashpartitioning in
    the plan — the single-pass multi-sink fan-out model)."""
    pages = generate_pages(spark, 5_000, partitions=4)
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))
    fused = out["fused_sinks"]

    from vector_spark.plans.pages import DOMAINS_PSEUDO_ROUTE

    key = lambda t: tuple(map(str, t))
    got_counts = sorted(
        map(tuple, fused.filter(F.col("route") != DOMAINS_PSEUDO_ROUTE)
            .select("route", "window_start", "geo_region", "events", "bytes").collect()),
        key=key,
    )
    want_counts = sorted(map(tuple, out["sink_counts"].collect()), key=key)
    assert got_counts == want_counts

    got_rollup = sorted(
        map(tuple, fused.filter(F.col("route") == DOMAINS_PSEUDO_ROUTE)
            .select("domain", "events", "bytes").collect()),
        key=key,
    )
    want_rollup = sorted(map(tuple, out["domain_rollup"].collect()), key=key)
    assert got_rollup == want_rollup

    import re
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
