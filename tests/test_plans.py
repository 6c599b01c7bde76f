"""Physical-plan assertions — the properties that make the pipeline hold at
100 TB, locked in as tests so a refactor can't silently regress them:

  * predicate pushdown reaches the parquet scan (PushedFilters),
  * column pruning drops unused columns from ReadSchema (a sink_counts
    aggregate must NOT read the `text` column),
  * small dims join as BroadcastHashJoin, never SortMergeJoin,
  * the salted two-phase aggregate equals the direct aggregate.
"""

from pyspark.sql import functions as F

from vector_spark.operators.skew import salted_agg
from vector_spark.plans import pages_pipeline
from vector_spark.sources import generate_pages, geo_dim, lang_dim

import pytest

from conftest import rows


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "pages")
    generate_pages(spark, 2000, partitions=2).write.parquet(path)
    return path


def test_filter_pushdown_reaches_scan(spark, pages_parquet):
    df = spark.read.parquet(pages_parquet).filter(
        (F.col("lang") == "en") & F.col("url").startswith("https://domain1.")
    )
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    assert "EqualTo(lang,en)" in plan
    assert "StringStartsWith(url,https://domain1.)" in plan


def test_column_pruning_sink_counts_never_reads_text(spark, pages_parquet):
    """The north-rule aggregate needs url/warc_ts/html/lang — the (large)
    `text` column must be pruned out of the parquet scan."""
    pages = spark.read.parquet(pages_parquet)
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))["sink_counts"]
    plan = plan_of(out)
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines, "no scan in plan?"
    for line in scan_lines:
        assert "text" not in line, f"text column not pruned: {line}"
        assert "html" in line  # still needed (status parse + byte counts)


def test_enrich_joins_are_broadcast_not_sortmerge(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))["routed"]
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_projection_pruning_two_columns(spark, pages_parquet):
    df = spark.read.parquet(pages_parquet).select("url", "lang")
    line = next(l for l in plan_of(df).splitlines() if "ReadSchema" in l)
    assert "html" not in line and "text" not in line and "warc_ts" not in line


def test_whole_stage_codegen_covers_parse(spark, pages_parquet):
    from vector_spark.plans.pages import parse_pages

    plan = plan_of(parse_pages(spark.read.parquet(pages_parquet)))
    # "*(n)" prefixes mark whole-stage-codegen stages in the plan string
    assert "*(1)" in plan


def test_salted_agg_equals_direct(spark):
    df = generate_pages(spark, 3000, partitions=4).select(
        F.substring_index(F.parse_url("url", F.lit("HOST")), ".", 1).alias("domain"),
        F.length("html").alias("b"),
    )
    salted = salted_agg(
        df, ["domain"],
        {"n": ("count", "b"), "bytes": ("sum", "b"),
         "lo": ("min", "b"), "hi": ("max", "b")},
        salt_buckets=8,
    )
    direct = df.groupBy("domain").agg(
        F.count("b").alias("n"), F.sum("b").alias("bytes"),
        F.min("b").alias("lo"), F.max("b").alias("hi"),
    )
    assert rows(salted) == rows(direct)


def test_salted_agg_rejects_holistic(spark):
    df = generate_pages(spark, 10, partitions=1)
    with pytest.raises(ValueError, match="not algebraic"):
        salted_agg(df, ["lang"], {"m": ("median", "html")})


def test_reduce_flush_conditions_single_exchange(spark):
    """reduce with gap + max_events stacks all running-window columns over
    ONE shuffle (same partition/order), and the final per-session aggregate
    reuses the user_id hash partitioning — exactly one Exchange total."""
    from vector_spark.operators import reduce_sessions
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "event_id long, user_id long, value double",
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id") * 10))
    out = reduce_sessions(
        df, ["user_id"], {"v": ("sum", "value")},
        ts_col="ts", gap_secs=60, order_col=["ts", "event_id"],
        max_events=3, end_every_secs=120,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_aggregate_sketch_two_hash_aggs_partial(spark):
    """aggregate_sketch's physical shape at 100 TB: bucket counts reduce
    through a partial+final HashAggregate pair (map-side combine = the
    mergeable sketch state), then one more narrow exchange for the
    per-series fold — no SortAggregate, no extra shuffles, and the fold
    runs over collected bucket structs (<= ~4k per series), never rows."""
    import datetime as dt

    from vector_spark.operators import aggregate_sketch

    df = spark.createDataFrame(
        [("m", dt.datetime(2024, 1, 1, 0, 0, i % 60), float(i + 1)) for i in range(100)],
        "name string, ts timestamp, value double",
    )
    plan = plan_of(aggregate_sketch(df, [0.5], window_secs=3600))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "SortAggregate" not in plan
    # partial aggregation present for the bucket-count level
    assert "partial_count" in plan or "HashAggregate" in plan


def test_netflow_template_pass_no_shuffle(spark):
    """Template extraction is a narrow packet-column scan: mapInPandas
    straight over the source, zero Exchange before the (tiny) latest-wins
    window in netflow_template_map."""
    from test_netflow import _v9_template_packet
    from vector_spark.functions import extract_netflow_templates

    df = spark.createDataFrame(
        [(bytearray(_v9_template_packet()),)], "packet binary"
    )
    plan = plan_of(extract_netflow_templates(df))
    assert "Exchange" not in plan


def test_reduce_hot_split_uses_broadcast_flag_join(spark):
    """The hot_split count pass joins back as a broadcast (tiny flag dim),
    never a SortMergeJoin on the fact."""
    import datetime as dt

    from vector_spark.operators import reduce_sessions

    df = spark.createDataFrame(
        [(i, "g", dt.datetime(2024, 1, 1, 0, 0, i % 60), 1.0) for i in range(100)],
        "event_id long, g string, ts timestamp, v double",
    )
    plan = plan_of(
        reduce_sessions(df, ["g"], {"n": ("count", "event_id")},
                        order_col=["ts", "event_id"],
                        hot_split={"threshold": 10, "slice_secs": 3600})
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_and_anti_joins_stay_hash_joins(spark):
    """The TPC-H q4/q16/q22 shapes (EXISTS -> LeftSemi, NOT IN/NOT EXISTS ->
    LeftAnti) must compile to broadcast HASH joins when the lookup side is
    dim-sized — a SortMergeJoin here would shuffle the whole fact at 100 TB.
    Mirrors __spark_entry__.q_tpch_q4/q_tpch_q22."""
    import datetime as dt

    from pyspark.sql import functions as F

    o = spark.createDataFrame(
        [(i, i % 7, dt.datetime(1996, 7, 1 + i % 20)) for i in range(200)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [(i % 50, dt.datetime(1996, 7, 5 + i % 20)) for i in range(300)],
        "l_orderkey long, l_shipdate timestamp",
    )
    semi = o.join(
        F.broadcast(li),
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "leftsemi",
    )
    plan = plan_of(semi)
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    bad = spark.createDataFrame([(k,) for k in range(3)], "k long")
    anti = o.join(F.broadcast(bad), o.o_custkey == bad.k, "left_anti")
    plan = plan_of(anti)
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_spans_plan_two_scans_three_exchanges(spark):
    """dedup_spans detects first occurrences with a skew-immune
    groupBy-min + join (hot spans collapse in the map-side partial agg —
    a window over sh would serialize a corpus-hot span into one task).
    The price is the input subtree appearing twice (firsts is derived
    from lines); the kept-flag reassembly keeps it at exactly two, with
    three exchanges and no per-doc base join."""
    from vector_spark.datapipe import dedup_spans

    df = spark.createDataFrame(
        [(i, f"a b c w{i} x y") for i in range(50)], "doc_id long, text string"
    )
    plan = plan_of(dedup_spans(df, span_words=3))
    assert plan.count("Exchange") <= 3
    assert "Window" not in plan  # no skewable window partition anywhere


def test_correlated_extremum_joins_back_broadcast(spark):
    """The TPC-H q2/q15/q17 shape — a per-key aggregate (max / avg) joined
    back against its own source — must re-join as a broadcast HASH join
    when the aggregate side is key-sized, and the scalar-subquery variant
    (1-row threshold, q11/q22) must broadcast that single row rather than
    shuffling the fact. Mirrors __spark_entry__.q_tpch_q2/q11/q15/q17."""
    cand = spark.createDataFrame(
        [(i % 20, float(i % 7), f"s{i}") for i in range(500)],
        "pk long, bal double, name string",
    )
    best = cand.groupBy(F.col("pk").alias("_pk")).agg(F.max("bal").alias("_best"))
    joined = cand.join(
        F.broadcast(best),
        (cand.pk == best._pk) & (cand.bal == best._best),
    )
    plan = plan_of(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    total = cand.agg(F.sum(F.col("bal").cast("decimal(25,6)")).cast("double").alias("_t"))
    thresholded = cand.join(F.broadcast(total)).filter(F.col("bal") > F.col("_t") * 0.01)
    plan = plan_of(thresholded)
    # 1-row scalar subquery: broadcast nested-loop cross join is the right
    # physical op (no join key); the fact side must NOT exchange for it
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_exists_not_exists_self_join_pair(spark):
    """The TPC-H q21 shape — EXISTS(other supplier) + NOT EXISTS(other late
    supplier) as a LeftSemi/LeftAnti pair over the same 3-column
    projection — keeps both anti/semi joins and never degenerates into a
    CartesianProduct (the non-equi suppkey<>suppkey predicate must ride
    the orderkey equi-key). Mirrors __spark_entry__.q_tpch_q21."""
    lo = spark.createDataFrame(
        [(i % 40, i % 5, i % 3 == 0) for i in range(400)],
        "l_orderkey long, l_suppkey long, _late boolean",
    )
    l1 = lo.filter(F.col("_late"))
    l2 = lo.select(F.col("l_orderkey").alias("_k2"), F.col("l_suppkey").alias("_s2"))
    l3 = lo.filter(F.col("_late")).select(
        F.col("l_orderkey").alias("_k3"), F.col("l_suppkey").alias("_s3")
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("_k2")) & (F.col("l_suppkey") != F.col("_s2")),
        "leftsemi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("_k3")) & (F.col("l_suppkey") != F.col("_s3")),
        "leftanti",
    )
    plan = plan_of(waiting)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # orderkey rides as the hash key in either strategy; both are shuffles
    # on the equi-key at scale, which is the correct distributed plan
    got = {(r.l_orderkey, r.l_suppkey) for r in waiting.collect()}
    # independent reference: brute-force the semantics in python
    rows_py = [(i % 40, i % 5, i % 3 == 0) for i in range(400)]
    expect = set()
    for k, s, late in rows_py:
        if not late:
            continue
        others = [(s2, l2_) for (k2, s2, l2_) in rows_py if k2 == k and s2 != s]
        if others and not any(l2_ for _, l2_ in others):
            expect.add((k, s))
    assert got == expect


def test_langid_scores_staged_once(spark):
    """Each language profile's lookahead regex must appear exactly ONCE in
    the optimized plan — the argmax tie-break references staged score
    ATTRIBUTES. Built inline, the chain embeds every regex ~2n times
    (measured 461 KB plan, 1520 regex nodes, codegen bailout) — the
    langid_pick composition rule, pinned here for langid() and
    crawl_pipeline()."""
    from vector_spark.datapipe import langid
    from vector_spark.datapipe.text import LANG_TRIGRAMS
    from vector_spark.plans import crawl_pipeline

    df = spark.createDataFrame(
        [(1, "the cat and the hat went to the market with the dog")],
        "doc_id long, text string",
    )
    # the 26-column score projection exceeds the default 25-field
    # plan-print truncation, which would hide (not remove) one regex
    spark.conf.set("spark.sql.debug.maxToStringFields", 200)
    try:
        plan = langid(df)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("(?=(?:") == len(LANG_TRIGRAMS)

        warc = spark.createDataFrame([("x",)], "buf string")
        plan = (
            crawl_pipeline(warc)["curated"]
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert plan.count("(?=(?:") == len(LANG_TRIGRAMS)
    finally:
        spark.conf.unset("spark.sql.debug.maxToStringFields")


def test_mixture_sample_boundary_window_only(spark):
    """The hierarchical prefix sum's invariants: bucket totals broadcast
    (never SortMergeJoin), and the only per-ROW window partitions by
    (group, bucket) — the full group is never a single sort partition."""
    from vector_spark.datapipe import mixture_sample

    docs = spark.createDataFrame(
        [(i, "g" + str(i % 2), "w " * (i % 9 + 1)) for i in range(200)],
        "doc_id long, grp string, text string",
    )
    plan = plan_of(mixture_sample(docs, {"g0": 50, "g1": 50}, group_col="grp"))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # fine windows are keyed by (grp, _bk); bucket-prefix windows by grp
    # alone are fine (<=256 rows per group) — only row-level sums matter
    import re

    row_windows = [
        w for w in re.findall(r"Window \[sum\((?:n_tokens|_n)[^\]]*windowspecdefinition\(([^)]*)\)", plan)
    ]
    assert row_windows and all("_bk" in w for w in row_windows)


def test_pack_sequences_single_exchange_and_narrow_payload(spark):
    """One hash exchange (the shard window) feeds the cumsum; the span
    explode is in-stage; text never survives past the token count."""
    from vector_spark.datapipe import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * (i % 9 + 1)) for i in range(200)], "doc_id long, text string"
    )
    plan = plan_of(pack_sequences(docs, seq_len=8))
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Generate explode" in plan
    # the window's input projection carries no text column
    m = re.search(r"Window \[sum\(_n.*", plan)
    assert m is not None


def test_connected_components_labels_join_no_bnlj(spark):
    """Every iteration's joins are hash joins — no nested-loop fallback
    on the label/edge equi-joins."""
    from vector_spark.datapipe import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "doc_a long, doc_b long"
    )
    out = connected_components(nodes, pairs)
    plan = plan_of(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_pair_counts_shuffles_carry_dictionaries(spark):
    """Both hash exchanges aggregate BEFORE shuffling (partial
    HashAggregate below each Exchange): raw tokens never cross the wire;
    the rank window runs over the pair dictionary only."""
    import re

    from vector_spark.datapipe import bpe_pair_counts

    docs = spark.createDataFrame(
        [(i, "ab ba abc " * (i % 3 + 1)) for i in range(100)],
        "doc_id long, text string",
    )
    plan = plan_of(bpe_pair_counts(docs, top_n=5))
    assert "CartesianProduct" not in plan
    # each hashpartitioning exchange is fed by a partial HashAggregate
    for m in re.finditer(r"Exchange hashpartitioning\(([^,)]+)", plan):
        assert m.group(1).startswith(("w#", "pair_left#")), m.group(0)


def test_tfidf_no_nested_loop_and_term_join_keys(spark):
    """The tf/df combine is a term-keyed equi-join; the corpus count is
    the only nested-loop (1-row broadcast)."""
    from vector_spark.datapipe import tfidf_keywords

    docs = spark.createDataFrame(
        [(i, "a b c common") for i in range(50)], "doc_id long, text string"
    )
    plan = plan_of(tfidf_keywords(docs, k=2))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the count row only


def test_pagerank_joins_are_equi_and_plan_is_single(spark):
    """All rank/edge joins extract equi-keys (no cartesian products); the
    unrolled rounds stay one adaptive plan."""
    from vector_spark.datapipe import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(40)], "node_id long")
    edges = spark.createDataFrame(
        [(i, (i * 7) % 40) for i in range(40)], "src long, dst long"
    )
    import re

    out = pagerank(nodes, edges, iterations=3)
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    # nested loops exist ONLY as the 1-row count broadcast (re-printed once
    # per lineage reference; AQE's ReusedExchange dedupes it at runtime) —
    # every data exchange is keyed by the rank/edge join columns
    for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan):
        assert m.group(1) in ("_id", "_src", "_dst"), m.group(0)
    assert plan.startswith("AdaptiveSparkPlan")


def test_robots_windows_partition_by_host(spark):
    """Every parse window partitions by host (the per-host-small side);
    the admission join is a hash join on host."""
    import re

    from vector_spark.datapipe import parse_robots_rules, robots_filter

    robots = spark.createDataFrame(
        [(f"h{i}", "User-agent: *\nDisallow: /p\nAllow: /p/ok") for i in range(20)],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots)
    for m in re.finditer(r"Window .*windowspecdefinition\((\w+)#", plan_of(rules)):
        assert m.group(1) == "host", m.group(0)

    urls = spark.createDataFrame(
        [(i, f"h{i % 20}", "/p/x") for i in range(100)],
        "uid long, host string, path string",
    )
    plan = plan_of(robots_filter(urls, rules, url_col="uid"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_substrings_plan_shape(spark):
    """The gram count partial-aggregates before its exchange (skew
    immunity), every exchange is keyed (no cartesian/BNLJ), and the gram
    TEXT never crosses a shuffle — exchanges carry hash/id/pos only."""
    import re

    from vector_spark.datapipe import dedup_substrings

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(50)], "doc_id long, text string"
    )
    plan = plan_of(dedup_substrings(df, k=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # partial count before the gh exchange (merge_count appears after)
    assert re.search(r"partial_count", plan), plan
    for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan):
        assert m.group(1) in ("gh", "doc_id"), m.group(0)


def test_bloom_probe_broadcasts_filter(spark):
    """bloom_filter_probe must broadcast the word table (small by
    construction: <= m/63 rows) — a sort-merge join here would shuffle the
    full probe corpus's position rows at 100 TB."""
    from vector_spark.datapipe import bloom_filter_build, bloom_filter_probe

    corpus = spark.createDataFrame([(f"c{i}",) for i in range(30)], "text string")
    delta = spark.createDataFrame([(i, f"d{i}") for i in range(10)],
                                  "doc_id long, text string")
    out = bloom_filter_probe(delta, bloom_filter_build(corpus, "text"),
                             "text", "doc_id")
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # text never crosses an exchange: only positions/ids shuffle
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, f"text in exchange: {line}"


def test_multiline_endinclude_no_python_one_exchange(spark):
    """The EndInclude multiline modes (continue_past / halt_with) are pure
    window expressions since the transition-monoid rewrite: NO Python eval
    node of any kind, no join-back, and exactly ONE Exchange (the source
    key shuffle serves the windows and the final reassembly agg)."""
    from vector_spark.operators.multiline import multiline_agg

    df = spark.createDataFrame(
        [("h", i, f"stmt {i};" if i % 3 == 0 else "cont") for i in range(30)],
        "host string, event_id long, line string",
    )
    for mode in ("continue_past", "halt_with"):
        plan = plan_of(
            multiline_agg(df, r"^stmt", r";$", mode=mode, key_cols="host")
        )
        assert "EvalPython" not in plan, mode   # Batch- and ArrowEvalPython
        assert "Join" not in plan, mode
        assert plan.count("Exchange") == 1, mode


def test_onepass_extract_shares_replace_via_subexpr_elimination(spark):
    """_extract_all's anchored fast path computes the regexp_replace+split
    ONCE per row however many fields are selected. The sharing happens at
    whole-stage CODEGEN (the logical plan textually repeats the
    expression), so assert on the generated code: a subExpr method exists
    and the project consumes its cached result per field — this is exactly
    what a when()-based form loses (conditional branches are excluded from
    subexpression elimination, measured re-running the replace per field)."""
    from vector_spark.functions.parse import SYSLOG_3164, _extract_all

    df = spark.createDataFrame([("x",)], "line string")
    f = _extract_all(F.col("line"), SYSLOG_3164)
    sel = df.select(
        *[f[n].alias(n) for n in ("priority", "hostname", "appname", "message")]
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    code = sel._jdf.queryExecution().explainString(mode)
    assert "subExpr_0(" in code          # the shared replace+split method
    assert code.count("subExprIsNull_0") >= 4  # each field reads the cache
    # and no per-field regexp_extract survives anywhere in the plan
    assert "regexp_extract" not in code


def test_ngram_jaccard_plan_shape(spark):
    """counts: no cartesian/BNLJ anywhere and the gram ARRAYS never cross a
    shuffle (the inverted-index exchanges carry doc ids + a single gram);
    prefix: the candidate join is a hash equi-join on the prefix gram, with
    the BNLJ confined to nothing — brute is the only method allowed one."""
    from vector_spark.datapipe import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, "abcdefghij"[: 3 + i % 7]) for i in range(40)],
        "doc_id long, text string",
    )
    for m in ("counts", "prefix"):
        plan = plan_of(ngram_jaccard_pairs(df, threshold=0.5, method=m))
        assert "CartesianProduct" not in plan, m
        assert "BroadcastNestedLoopJoin" not in plan, m


def test_simhash_hamming_pairs_plan_banded_equi_join(spark):
    """The Manku candidate join is a plain hash EQUI-join on the
    (combo_idx, combo_bits) key — no cartesian / nested-loop fallback —
    and the join inputs carry (id, fingerprint, key) only: the document
    text column is pruned before the exchange."""
    from vector_spark.datapipe import simhash_hamming_pairs

    df = spark.createDataFrame(
        [(i, "w%d w%d w%d" % (i % 5, (i // 2) % 5, i % 3)) for i in range(60)],
        "doc_id long, text string",
    )
    plan = plan_of(simhash_hamming_pairs(df, max_hamming=3, bits=32, n_blocks=6))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # text is pruned out before any exchange: no shuffle carries it
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line


def test_image_near_dup_plan_equi_join_no_payload_shuffle(spark):
    """The perceptual-hash near-dup join inherits the Manku geometry: a
    plain equi-join on (combo_idx, combo_bits); the binary payload is
    consumed by the Arrow aHash map and never crosses an exchange."""
    from vector_spark.datapipe import image_near_dup

    df = spark.createDataFrame(
        [(i, bytes([(i * 7 + j) % 256 for j in range(64)])) for i in range(40)],
        "doc_id long, payload binary",
    )
    plan = plan_of(image_near_dup(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload" not in line, line


def test_wet_extract_no_shuffle(spark):
    """WARC -> WET is scan-speed: frame walk + record parse + envelope
    strip + extraction are all narrow — ZERO exchanges in the plan."""
    from vector_spark.datapipe import warc_to_wet

    df = spark.createDataFrame(
        [(1, "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n\r\nhtml\r\n\r\n")],
        "doc_id long, warc string",
    )
    plan = plan_of(warc_to_wet(df, keep_cols=("doc_id",)))
    assert "Exchange" not in plan


def test_merge_partial_lines_single_exchange(spark):
    """The partial-event merger's run-id window and the (file, run)
    groupBy share the file hash partitioning (HashPartitioning(f)
    satisfies the (f, _run) clustered distribution) — exactly one
    Exchange total, so at 100 TB the merger costs ONE shuffle keyed by
    file, never a second one for the aggregate."""
    from vector_spark.functions import merge_partial_lines
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"f{i % 3}", i, f"m{i}", i % 2 == 0, i * 10) for i in range(30)],
        "f string, pos long, message string, partial boolean, ts long",
    )
    out = merge_partial_lines(df, ("f",), "pos")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_quantized_topk_broadcasts_queries_no_bnlj(spark):
    """quantized_cosine_topk: the query side rides a broadcast
    (non-equi self-join must be BroadcastNestedLoopJoin over the TINY
    query set, never a cartesian over the corpus), and the int8 index
    build is narrow — no Exchange before the join."""
    from vector_spark.datapipe import quantized_cosine_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = quantized_cosine_topk(df, query_ids=[0, 1], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # broadcast(q), |q| = 2
    # the only hash Exchange in the whole plan belongs to the final top-k
    # window (partitionBy query_id), not the index build — quantization
    # is a narrow map over the scan
    assert plan.count("Exchange hashpartitioning") == 1, plan
