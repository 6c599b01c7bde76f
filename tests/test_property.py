"""Property-based tests (hypothesis) — the analogue of the reference's
proptest/arbitrary layer (SURVEY §5.4): operator invariants that must hold
for ANY input, not just the hand-written goldens.

Each property runs real Spark jobs, so example counts are kept small; the
row strategies are deterministic under hypothesis's seed control.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from vector_spark.operators import dedupe, exclusive_route, route, sample
from vector_spark.operators.reduce import reduce_sessions
from vector_spark.operators.route import routed_union

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

events = st.lists(
    st.tuples(
        st.integers(0, 50),            # value
        st.sampled_from(["a", "b", "c"]),  # kind
        st.integers(0, 120),           # seconds offset
    ),
    min_size=1,
    max_size=30,
).map(lambda rows: [
    (i, v, k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
    for i, (v, k, s) in enumerate(rows)
])

SCHEMA = "event_id long, value long, kind string, ts timestamp"
CONDS = {"big": "value > 25", "a_kind": "kind = 'a'"}


@given(rows=events)
@settings(**SETTINGS)
def test_route_partitions_cover_input_exactly(spark, rows):
    """exclusive_route: every event lands on exactly one port; route
    (multi-match): port membership == independent filter membership."""
    df = spark.createDataFrame(rows, SCHEMA)
    labeled = exclusive_route(df, CONDS)
    assert labeled.count() == len(rows)
    assert labeled.select("event_id").distinct().count() == len(rows)

    ports = route(df, CONDS)
    for name, cond in CONDS.items():
        expect = {r.event_id for r in df.filter(cond).collect()}
        got = {r.event_id for r in ports[name].collect()}
        assert got == expect


@given(rows=events)
@settings(**SETTINGS)
def test_routed_union_consistent_with_ports(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    flat = routed_union(df, CONDS)
    ports = route(df, CONDS)
    flat_pairs = {(r.event_id, r.route) for r in flat.collect()}
    port_pairs = {
        (r.event_id, name) for name, p in ports.items() for r in p.collect()
    }
    assert flat_pairs == port_pairs


@given(rows=events)
@settings(**SETTINGS)
def test_dedupe_first_is_minimal_representative(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = dedupe(df, match=["kind", "value"], order_by="event_id").collect()
    # one row per distinct key, and it is the min-event_id witness
    by_key = {}
    for i, v, k, _ in rows:
        by_key.setdefault((k, v), i)
    assert {(r.kind, r.value): r.event_id for r in out} == by_key


@given(rows=events)
@settings(**SETTINGS)
def test_reduce_sessions_conserves_events(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = reduce_sessions(
        df, ["kind"], {"n": ("count", "event_id"), "vsum": ("sum", "value")},
        ts_col="ts", gap_secs=30, order_col=["ts", "event_id"],
    ).collect()
    assert sum(r["n"] for r in out) == len(rows)           # no event lost
    assert sum(r["vsum"] for r in out) == sum(v for _, v, _, _ in rows)
    for r in out:
        assert r["ts"] <= r["ts_end"]


@given(rows=events, rate=st.sampled_from([1, 2, 4]))
@settings(**SETTINGS)
def test_sample_membership_is_stable(spark, rows, rate):
    df = spark.createDataFrame(rows, SCHEMA)
    a = {r.event_id for r in sample(df, rate, key_field="event_id").collect()}
    b = {r.event_id for r in sample(df.repartition(3), rate, key_field="event_id").collect()}
    assert a == b
    if rate == 1:
        assert a == {r[0] for r in rows}


@given(rows=events, max_events=st.integers(1, 5))
@settings(**SETTINGS)
def test_reduce_flush_conserves_events(spark, rows, max_events):
    """For ANY event set and max_events: chunk sizes sum to the input count,
    no chunk exceeds max_events, and the result is partition-invariant."""
    df = spark.createDataFrame(rows, SCHEMA)
    out = reduce_sessions(
        df, ["kind"], {"n": ("count", "event_id")},
        ts_col="ts", gap_secs=30, order_col=["ts", "event_id"],
        max_events=max_events,
    )
    got = [(r.kind, r.ts, r.events_merged) for r in out.collect()]
    assert sum(g[2] for g in got) == len(rows)
    assert all(g[2] <= max_events for g in got)
    re_got = [
        (r.kind, r.ts, r.events_merged)
        for r in reduce_sessions(
            df.repartition(5), ["kind"], {"n": ("count", "event_id")},
            ts_col="ts", gap_secs=30, order_col=["ts", "event_id"],
            max_events=max_events,
        ).collect()
    ]
    assert sorted(got) == sorted(re_got)


ips = st.lists(
    st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)),
    min_size=1, max_size=20,
).map(lambda triples: [
    (i, f"10.{a}.{b}.{c}") for i, (a, b, c) in enumerate(triples)
])


@given(rows=ips)
@settings(**SETTINGS)
def test_enrich_ip_range_equals_naive_between(spark, rows):
    """The block-exploded hash join must equal the naive BETWEEN lookup for
    ANY IPs (matched, unmatched, boundary)."""
    from vector_spark.functions.strings import ip_aton
    from vector_spark.operators import enrich_ip_range
    from vector_spark.sources import geoip_dim

    df = spark.createDataFrame(rows, "id long, ip string")
    dim = geoip_dim(spark).select("ip_start", "ip_end", "country", "region")
    fast = enrich_ip_range(df, dim, "ip")
    naive = df.alias("f").join(
        dim.alias("d"),
        ip_aton(F.col("f.ip")).between(
            ip_aton(F.col("d.ip_start")), ip_aton(F.col("d.ip_end"))
        ),
        "left",
    ).select("f.id", "d.country", "d.region")
    assert sorted((r.id, r.country, r.region) for r in fast.select("id", "country", "region").collect()) == \
           sorted((r.id, r.country, r.region) for r in naive.collect())


@given(rows=ips)
@settings(**SETTINGS)
def test_ipv6_mapped_roundtrip(spark, rows):
    """ipv6_to_ipv4(ip_to_ipv6(v4)) == v4 for any IPv4."""
    from vector_spark.functions import ip_to_ipv6, ipv6_to_ipv4

    df = spark.createDataFrame(rows, "id long, ip string")
    out = df.select("ip", ipv6_to_ipv4(ip_to_ipv6(F.col("ip"))).alias("rt"))
    assert all(r.ip == r.rt for r in out.collect())


flow_tuples = st.lists(
    st.tuples(
        st.integers(0, 2**32 - 1),   # src ip as uint32
        st.integers(0, 65535),       # src port
        st.integers(0, 65535),       # dst port
        st.integers(0, 2**32 - 1),   # byte count
        st.integers(0, 255),         # proto
    ),
    min_size=1,
    max_size=12,
)


@given(flows=flow_tuples)
@settings(**SETTINGS)
def test_netflow_v9_roundtrip_any_flows(spark, flows):
    """For ANY flow values, hand-encoding a v9 packet and decoding it
    through the template machinery recovers every field exactly."""
    from test_netflow import _u, _v9_data_packet, _v9_template_packet

    def rec(src, sport, dport, byts, proto):
        return (
            src.to_bytes(4, "big") + bytes([192, 168, 0, 1])
            + _u(sport, 2) + _u(dport, 2) + _u(1, 4) + _u(byts, 4) + _u(proto, 1)
        )

    from vector_spark.functions import parse_netflow

    pkts = [
        (bytearray(_v9_template_packet()),),
        (bytearray(_v9_data_packet(256, [rec(*f) for f in flows])),),
    ]
    df = spark.createDataFrame(pkts, "packet binary")
    out = parse_netflow(df).orderBy("rec_idx").collect()
    assert len(out) == len(flows)
    for r, (src, sport, dport, byts, proto) in zip(out, flows):
        f = dict(r.fields)
        assert f["ipv4_src_addr"] == ".".join(str(x) for x in src.to_bytes(4, "big"))
        assert (int(f["l4_src_port"]), int(f["l4_dst_port"])) == (sport, dport)
        assert (int(f["in_bytes"]), int(f["protocol"])) == (byts, proto)


@given(msgs=st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_octet_counting_roundtrip_any_unicode(spark, msgs):
    """RFC 6587 framing: for ANY unicode messages, '<bytelen> <msg>'
    concatenation reframes to exactly the original messages."""
    from vector_spark.functions import frame_octet_counting

    buf = "".join(f"{len(m.encode('utf-8'))} {m}" for m in msgs)
    df = spark.createDataFrame([(buf,)], "buf string")
    got = df.select(frame_octet_counting(F.col("buf")).alias("f")).collect()[0].f
    assert got == msgs


@given(
    vals=st.lists(
        st.floats(min_value=0.001, max_value=1e6, allow_nan=False,
                  allow_infinity=False),
        min_size=3, max_size=60,
    )
)
@settings(**SETTINGS)
def test_sketch_quantile_error_bound_any_values(spark, vals):
    """aggregate_sketch: for ANY positive value set, every interior
    quantile is within gamma-1 = 2*eps relative error of the EXACT
    RANK-BASED sample quantile (the agent's semantics: rank =
    round_half_even(q*(n-1)) picks a sample — NOT the linearly
    interpolated percentile, which diverges arbitrarily at tiny n);
    count/sum are exact and q=0/1 return true min/max."""
    from vector_spark.operators import aggregate_sketch

    rows = [
        ("m", dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "name string, ts timestamp, value double")
    qs = [0.0, 0.25, 0.5, 0.75, 0.99, 1.0]
    sk = aggregate_sketch(df, qs, window_secs=86400).collect()[0]
    n = len(vals)
    srt = sorted(vals)
    assert sk["count"] == n
    assert abs(sk["sum"] - sum(vals)) <= 1e-5 * max(1.0, abs(sum(vals)))
    assert abs(sk["q0_0"] - srt[0]) <= 1e-6 * max(1.0, srt[0])
    assert abs(sk["q1_0"] - srt[-1]) <= 1e-6 * max(1.0, srt[-1])

    def rte(x: float) -> int:
        import decimal

        return int(decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_EVEN))

    for q, name in [(0.25, "q0_25"), (0.5, "q0_5"), (0.75, "q0_75"), (0.99, "q0_99")]:
        exact = srt[min(rte(q * (n - 1)), n - 1)]
        rel = abs(sk[name] - exact) / abs(exact)
        assert rel <= 2.0 / 128 + 1e-6, (name, sk[name], exact, rel)


@given(
    rows=st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            st.lists(st.integers(0, 5), min_size=0, max_size=4),
        ),
        min_size=1, max_size=15,
    )
)
@settings(**SETTINGS)
def test_stream_merge_fold_equals_batch_aggregates(spark, rows):
    """The streaming reduce's pure-Python fold (_merge_step/_merge_final)
    must equal the batch MERGE_STRATEGIES aggregates for every strategy on
    one closed session, for ANY inputs — the fold has 13 branches and this
    pins each against its Column twin."""
    from vector_spark.operators.reduce import reduce_sessions
    from vector_spark.streaming.ops import _merge_final, _merge_step

    data = [
        (i, "g", dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
         float(v), s, arr)
        for i, (v, s, arr) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, g string, ts timestamp, num double, body string, arr array<int>",
    )
    merges = {
        "first_b": ("discard", "body"), "last_b": ("retain", "body"),
        "arr_b": ("array", "body"), "cat": ("concat", "body"),
        "cat_nl": ("concat_newline", "body"), "cat_raw": ("concat_raw", "body"),
        "s": ("sum", "num"), "mx": ("max", "num"), "mn": ("min", "num"),
        "cnt": ("count", "num"), "fu": ("flat_unique", "arr"),
        "sa": ("shortest_array", "arr"), "la": ("longest_array", "arr"),
    }
    batch = reduce_sessions(
        df, ["g"], merges, gap_secs=10_000, order_col=["ts", "event_id"]
    ).collect()
    assert len(batch) == 1
    b = batch[0]

    partial: dict = {}
    for _, v, s, arr in [(r[0], r[3], r[4], r[5]) for r in data]:
        for out_col, (strategy, in_col) in merges.items():
            val = {"num": v, "body": s, "arr": arr}[in_col]
            _merge_step(partial, out_col, strategy, val)
    got = {c: _merge_final(partial, c, s_) for c, (s_, _) in merges.items()}

    assert got["first_b"] == b["first_b"] and got["last_b"] == b["last_b"]
    assert got["arr_b"] == list(b["arr_b"])
    assert got["cat"] == b["cat"] and got["cat_nl"] == b["cat_nl"]
    assert got["cat_raw"] == b["cat_raw"]
    assert abs(got["s"] - b["s"]) < 1e-9
    assert got["mx"] == b["mx"] and got["mn"] == b["mn"]
    assert got["cnt"] == b["cnt"]
    assert sorted(got["fu"]) == sorted(b["fu"])
    assert len(got["sa"]) == len(b["sa"]) and len(got["la"]) == len(b["la"])


@given(
    offsets=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),  # (hour, sec offset)
        min_size=2, max_size=25,
    )
)
@settings(**SETTINGS)
def test_hot_split_equivalence_any_slice_confined_data(spark, offsets):
    """hot_split: for ANY events confined to the first 1000s of each hour
    (so no session can reach a 3600s slice edge: inter-cluster gaps are
    >= 2600s > gap_secs), the split result equals the unsplit result
    row-for-row."""
    from vector_spark.operators import reduce_sessions

    rows = [
        (i, "hot" if i % 3 else "cold",
         dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, seconds=s), 1.0)
        for i, (h, s) in enumerate(offsets)
    ]
    df = spark.createDataFrame(rows, "event_id long, g string, ts timestamp, v double")
    merges = {"n": ("count", "event_id"), "vs": ("sum", "v")}
    kw = dict(gap_secs=1500, order_col=["ts", "event_id"])
    base = reduce_sessions(df, ["g"], merges, **kw)
    split = reduce_sessions(
        df, ["g"], merges, hot_split={"threshold": 1, "slice_secs": 3600}, **kw
    )
    cols = ("g", "ts", "ts_end", "events_merged", "n", "vs")
    a = sorted(tuple(r[c] for c in cols) for r in base.collect())
    b = sorted(tuple(r[c] for c in cols) for r in split.collect())
    assert a == b


@given(
    chunks_=st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=10)
)
@settings(**SETTINGS)
def test_length_delimited_roundtrip_any_bytes(spark, chunks_):
    """LengthDelimited framing: any byte chunks concatenated as
    <4B len><payload> reframe to exactly the originals."""
    from vector_spark.functions import frame_length_delimited

    buf = b"".join(len(c).to_bytes(4, "big") + c for c in chunks_)
    df = spark.createDataFrame([(bytearray(buf),)], "buf binary")
    got = df.select(frame_length_delimited(F.col("buf")).alias("f")).collect()[0].f
    assert [bytes(x) for x in got] == chunks_


_lp_token = st.text(alphabet="abcdefghij0123456789_", min_size=1, max_size=8)


@given(
    tagval=_lp_token, fval=st.floats(min_value=0, max_value=1e6, allow_nan=False),
    ts=st.integers(0, 2**40),
)
@settings(**SETTINGS)
def test_influxdb_line_roundtrip_any_values(spark, tagval, fval, ts):
    """Influxdb line protocol: encode(parse) identity for any token-safe
    tag values, float fields, and timestamps (the documented no-escaping
    subset)."""
    from vector_spark.functions import encode_influxdb_line, parse_influxdb_line

    df = spark.range(1)
    line = encode_influxdb_line(
        F.lit("m"), {"t": F.lit(tagval)}, {"v": F.lit(float(fval))}, F.lit(ts)
    )
    p = parse_influxdb_line(line)
    r = df.select(
        p["measurement"].alias("m"), p["tags"].getItem("t").alias("t"),
        p["fields"].getItem("v").cast("double").alias("v"),
        p["timestamp_ns"].alias("ts"),
    ).collect()[0]
    assert r.m == "m" and r.t == tagval and r.ts == ts
    assert abs(r.v - float(fval)) <= 1e-9 * max(1.0, abs(fval))


texts = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=20)
    .map(" ".join),
    min_size=1,
    max_size=12,
).map(lambda ts: [(i, t) for i, t in enumerate(ts)])

DOC_SCHEMA = "doc_id long, text string"


@given(docs=texts, k=st.integers(1, 4))
@settings(**SETTINGS)
def test_dedup_spans_conservation_and_first_wins(spark, docs, k):
    """For ANY corpus: every doc comes back exactly once; per doc
    n_removed + kept spans == n_spans; the multiset of kept spans equals
    the DISTINCT spans of the corpus (min_chars=0 removes every
    repeat, exactly one survivor per distinct span content)."""
    from vector_spark.datapipe import dedup_spans

    df = spark.createDataFrame(docs, DOC_SCHEMA)
    out = dedup_spans(df, span_words=k).collect()
    assert sorted(r.doc_id for r in out) == [d for d, _ in docs]
    # recompute spans in plain Python
    def spans(t):
        w = t.split(" ")
        nb = max(1, -(-len(w) // k))
        return [" ".join(w[i * k : i * k + k]) for i in range(nb)]

    all_spans = [s for _, t in docs for s in spans(t)]
    for r in out:
        assert r.n_spans == len(spans(dict(docs)[r.doc_id]))
        assert 0 <= r.n_removed <= r.n_spans
    total_kept = sum(r.n_spans - r.n_removed for r in out)
    assert total_kept == len(set(all_spans))


@given(docs=texts, chunk=st.integers(2, 6), overlap=st.integers(0, 4))
@settings(**SETTINGS)
def test_chunk_documents_coverage_any_input(spark, docs, chunk, overlap):
    """For ANY doc and any valid (chunk, overlap): concatenating each
    chunk's fresh tail (tokens past the overlap) reconstructs the doc
    exactly — no token lost, none duplicated beyond the declared
    overlap."""
    if overlap >= chunk:
        overlap = chunk - 1
    from vector_spark.datapipe import chunk_documents

    df = spark.createDataFrame(docs, DOC_SCHEMA)
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    stride = chunk - overlap
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text, r.n_tokens))
    for doc_id, text in docs:
        words = text.split(" ")
        chunks = sorted(by_doc[doc_id])
        assert chunks[0][0] == 0
        rebuilt = chunks[0][1].split(" ")
        for cid, ctext, ntok in chunks[1:]:
            toks = ctext.split(" ")
            assert toks[:overlap] == rebuilt[cid * stride : cid * stride + overlap]
            rebuilt.extend(toks[overlap:])
        assert rebuilt == words
        for cid, ctext, ntok in chunks:
            assert ntok == len(ctext.split(" "))


@given(docs=texts)
@settings(**SETTINGS)
def test_repetition_zero_iff_no_repeats(spark, docs):
    """A doc whose words are all distinct has every repetition fraction
    exactly 0; duplicating any doc's word sequence twice drives its
    top-n-gram fractions positive."""
    from vector_spark.datapipe import repetition_filter_gopher

    distinct_docs = [(i, " ".join(f"u{i}w{j}" for j in range(5))) for i in range(3)]
    df = spark.createDataFrame(distinct_docs, DOC_SCHEMA)
    for r in repetition_filter_gopher(df).collect():
        assert r.top_2gram_frac == 0.0 and r.dup_5gram_frac == 0.0 and r.keep

    doubled = [(i, t + " " + t) for i, t in docs if len(t.split(" ")) >= 2]
    if doubled:
        df2 = spark.createDataFrame(doubled, DOC_SCHEMA)
        for r in repetition_filter_gopher(df2).collect():
            assert r.top_2gram_frac > 0.0


# ---- session-tail operators: bpe / tfidf / pagerank / robots / semdedup ----

_docs_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "ab", "ba", "abc", "b"]), min_size=1, max_size=6),
    min_size=1,
    max_size=8,
).map(lambda docs: [(i, " ".join(ws)) for i, ws in enumerate(docs)])


@given(rows=_docs_strategy)
@settings(**SETTINGS)
def test_bpe_pair_counts_mass_conservation(spark, rows):
    """Total pair mass == sum over distinct words of f * (len-1); ranks are
    dense from 1 (the merge order is a total order)."""
    from collections import Counter

    from vector_spark.datapipe import bpe_pair_counts

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bpe_pair_counts(df, top_n=10**6).collect()
    words = Counter(w for _, t in rows for w in t.split())
    assert sum(r.pair_count for r in out) == sum(
        f * (len(w) - 1) for w, f in words.items()
    )
    assert sorted(r.rank for r in out) == list(range(1, len(out) + 1))


@given(rows=_docs_strategy)
@settings(**SETTINGS)
def test_tfidf_ubiquitous_term_scores_zero(spark, rows):
    """A term present in EVERY doc has idf ln((N+1)/(N+1)) = 0; per-doc
    ranks are dense from 1."""
    from vector_spark.datapipe import tfidf_keywords

    rows = [(i, t + " common") for i, t in rows]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_keywords(df, k=100).collect()
    assert all(r.score == 0.0 for r in out if r.term == "common")
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_doc.values())


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=1, max_size=15
    )
)
@settings(**SETTINGS)
def test_pagerank_mass_bounds(spark, edges):
    """Every node's rank >= the teleport floor; floor leakage only shrinks
    total mass; output covers exactly the node set."""
    from vector_spark.datapipe import pagerank

    scale, n = 10**9, 6
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node_id: r.pagerank for r in pagerank(nodes, e, iterations=2, scale=scale).collect()}
    tele = 15 * (scale // n) // 100
    assert set(got) == set(range(n))
    assert all(v >= tele for v in got.values())
    assert sum(got.values()) <= scale


@given(
    rules=st.lists(
        st.tuples(st.sampled_from(["/a", "/ab", "/abc", "/b"]), st.booleans()),
        max_size=6,
        unique=True,
    ),
    paths=st.lists(
        st.sampled_from(["/a/x", "/abc", "/ab", "/b/y", "/c"]), min_size=1, max_size=6
    ),
)
@settings(**SETTINGS)
def test_robots_filter_matches_reference_model(spark, rules, paths):
    """Admission equals the longest-match reference model: longest matching
    rule wins, allow wins length ties, no match -> allowed."""
    from vector_spark.datapipe import robots_filter

    rdf = spark.createDataFrame(
        [("h", r, a) for r, a in rules] or [("h_other", "/", False)],
        "host string, rule string, allow boolean",
    )
    urls = spark.createDataFrame(
        [(i, "h", p) for i, p in enumerate(paths)], "uid long, host string, path string"
    )
    got = {r.uid: r.allowed for r in robots_filter(urls, rdf, url_col="uid").collect()}

    def model(path):
        cand = [(r, a) for r, a in rules if path.startswith(r)]
        if not cand:
            return True
        cand.sort(key=lambda ra: (-len(ra[0]), not ra[1], ra[0]))
        return cand[0][1]

    assert got == {i: model(p) for i, p in enumerate(paths)}


@given(
    vecs=st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 5)), min_size=2, max_size=8
    )
)
@settings(**SETTINGS)
def test_semantic_dedup_matches_reference_model(spark, vecs):
    """Cluster assignment + prune rule equal a NumPy-free python model with
    the same round-half-up 6-decimal cosine convention. Pinned to the
    seed-centroid path (lloyd_rounds=0); the Lloyd-refined default is
    covered by test_lloyd.py and the semantic_dedup oracle."""
    from decimal import ROUND_HALF_UP, Decimal

    from vector_spark.datapipe import semantic_dedup

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    rows = [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vecs)]
    k = 2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.cluster, r.keep)
        for r in semantic_dedup(df, 0.9, n_centroids=k, lloyd_rounds=0).collect()
    }

    import math

    def cos(u, v):
        d = u[0] * v[0] + u[1] * v[1]
        return r6(d / (math.hypot(*u) * math.hypot(*v)))

    cents = [(i, v) for i, v in rows if i < k]
    cluster = {
        i: max(cents, key=lambda c: (cos(v, c[1]), -c[0]))[0] for i, v in rows
    }
    keep = {
        i: not any(
            j < i and cluster[j] == cluster[i] and cos(rows[j][1], v) >= 0.9
            for j, _ in rows
        )
        for i, v in rows
    }
    assert got == {i: (cluster[i], keep[i]) for i, _ in rows}


@given(
    corpus_texts=st.lists(st.sampled_from(["a b c", "d e f", "g h i"]), min_size=1, max_size=4),
    delta_texts=st.lists(st.sampled_from(["a b c", "d e f", "new words here"]), min_size=1, max_size=5),
)
@settings(**SETTINGS)
def test_incremental_dedup_exact_matches_set_model(spark, corpus_texts, delta_texts):
    """Exact tier == set membership: novel iff the text is absent from the
    corpus; dup_of is the lowest corpus id holding the same text; near=True
    can only shrink the novel set (exact matches always flagged)."""
    from vector_spark.datapipe import incremental_dedup

    corpus = spark.createDataFrame(list(enumerate(corpus_texts)), "doc_id long, text string")
    delta = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(delta_texts)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.novel, r.dup_of)
           for r in incremental_dedup(delta, corpus, near=False).collect()}
    first = {}
    for i, t in enumerate(corpus_texts):
        first.setdefault(t, i)
    expect = {
        100 + i: (t not in first, first.get(t)) for i, t in enumerate(delta_texts)
    }
    assert got == expect

    near_novel = {r.doc_id for r in
                  incremental_dedup(delta, corpus, near=True).collect() if r.novel}
    assert near_novel <= {k for k, (n, _) in expect.items() if n}


@given(rows=_docs_strategy)
@settings(**SETTINGS)
def test_corpus_stats_rollup_consistency(spark, rows):
    """Grand total row equals the input size; lang subtotals sum to it;
    every slice's docs sum to its lang subtotal."""
    from vector_spark.datapipe import corpus_stats

    docs = spark.createDataFrame(
        [(i, ["en", "de"][i % 2], f"s{i % 3}", t) for i, (_, t) in enumerate(rows)],
        "doc_id long, lang string, source string, text string",
    )
    out = corpus_stats(docs).collect()
    total = {(r.lang, r.source): r.docs for r in out}
    assert total[(None, None)] == len(rows)
    langs = [k[0] for k in total if k[0] is not None and k[1] is None]
    assert sum(total[(lg, None)] for lg in langs) == len(rows)
    for lg in langs:
        slices = sum(v for (l2, s2), v in total.items() if l2 == lg and s2 is not None)
        assert slices == total[(lg, None)]


@given(
    key=st.sampled_from(["org,ex)/", "com,a)/p"]),
    ts=st.integers(0, 99999999999999),
    length=st.integers(0, 10**9),
)
@settings(**SETTINGS)
def test_parse_cdx_roundtrip(spark, key, ts, length):
    """Constructing a CDXJ line from fields and parsing it returns the
    fields (14-digit ts zero-padded; numeric strings cast to long)."""
    from vector_spark.functions import parse_cdx

    ts14 = str(ts).zfill(14)
    line = (f'{key} {ts14} {{"url": "https://x/", "mime": "t/h", '
            f'"status": "200", "digest": "D", "length": "{length}", '
            f'"offset": "0", "filename": "f.warc.gz"}}')
    r = (spark.createDataFrame([(line,)], "line string")
         .select(parse_cdx(F.col("line")).alias("c")).select("c.*").collect()[0])
    assert (r.urlkey, r.ts, r.length, r.offset, r.filename) == (
        key, ts14, length, 0, "f.warc.gz")


def _substring_dedup_ref(docs: list[tuple[int, str]], k: int) -> dict[int, str]:
    """Pure-Python reference for duplicated-k-gram coverage removal."""
    from collections import Counter

    grams: Counter = Counter()
    toks = {i: t.split(" ") for i, t in docs}
    for ws in toks.values():
        for p in range(len(ws) - k + 1):
            grams[" ".join(ws[p : p + k])] += 1
    out = {}
    for i, ws in toks.items():
        covered = set()
        for p in range(len(ws) - k + 1):
            if grams[" ".join(ws[p : p + k])] >= 2:
                covered.update(range(p, p + k))
        out[i] = " ".join(w for j, w in enumerate(ws) if j not in covered)
    return out


@given(
    rows=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(2, 4),
)
@settings(**SETTINGS)
def test_dedup_substrings_matches_reference(spark, rows, k):
    """Spark's relational formulation == the direct Python reference for
    any corpus over a tiny alphabet (dense with repeats, the hard case:
    overlapping self-repeats, full-coverage docs, sub-k docs)."""
    from vector_spark.datapipe import dedup_substrings

    docs = [(i, " ".join(ws)) for i, ws in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_substrings(df, k=k).collect()}
    want = _substring_dedup_ref(docs, k)
    assert len(got) == len(docs)
    for i, t in docs:
        assert got[i].text_dedup == want[i], (i, t, k)
        n_words = len(t.split(" "))
        assert got[i].n_tokens == n_words
        kept = len(want[i].split(" ")) if want[i] else 0
        assert got[i].n_removed == n_words - kept


@given(
    rows=st.lists(
        st.lists(
            st.tuples(st.integers(3, 7), st.sampled_from(["", ".", "?", " javascript."])),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_c4_line_filter_matches_reference(spark, rows):
    """Line keep/drop == the C4 rules computed directly in Python, for any
    combination of line lengths and tails."""
    import re

    from vector_spark.datapipe import c4_line_filter

    docs = []
    for i, lines in enumerate(rows):
        body = "\n".join(
            " ".join(f"w{j}" for j in range(n)) + tail for n, tail in lines
        )
        docs.append((i, body))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in c4_line_filter(df, min_lines=2).collect()}
    for i, body in docs:
        lines = body.split("\n")
        kept = [
            l for l in lines
            if re.search(r'[.!?"”]$', l.rstrip())
            and len([w for w in l.split(" ") if w]) >= 5
            and "javascript" not in l.lower()
        ]
        assert got[i].text_clean == "\n".join(kept), (i, body)
        assert got[i].n_kept == len(kept) and got[i].n_lines == len(lines)
        assert got[i].keep == (len(kept) >= 2 and "{" not in body.lower())


@given(
    facts=st.lists(st.tuples(st.integers(0, 3),      # key
                             st.integers(0, 100)),   # fact ts (secs)
                   min_size=1, max_size=25),
    dims=st.lists(st.tuples(st.integers(0, 3),       # key
                            st.integers(0, 100)),    # version ts (secs)
                  min_size=1, max_size=12,
                  unique_by=lambda t: (t[0], t[1])),
)
@settings(**SETTINGS)
def test_enrich_asof_equals_naive_latest(spark, facts, dims):
    """enrich_asof == the naive per-fact argmax over all versions with
    version_ts <= fact_ts (null when none) — for ANY fact/version layout,
    including version ties across keys, facts before the first version,
    and keys with no versions at all."""
    from vector_spark.operators import enrich_asof

    base = dt.datetime(2024, 1, 1)
    fdf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(facts)],
        "id long, k long, t timestamp",
    )
    ddf = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), f"v{k}_{s}") for k, s in dims],
        "k long, valid_from timestamp, tag string",
    )
    out = {r.id: r.tag for r in
           enrich_asof(fdf, ddf, ("k", "k"), ts_col="t",
                       dim_ts_col="valid_from").collect()}
    for i, (k, s) in enumerate(facts):
        eligible = [(vs, f"v{dk}_{vs}") for dk, vs in dims if dk == k and vs <= s]
        expect = max(eligible)[1] if eligible else None
        assert out[i] == expect, (i, k, s, eligible)


# ------------------------------------------------ one-pass regex extract

# syslog-shaped fragments biased to produce both matches and near-misses,
# plus arbitrary printable-ASCII junk (excluding \x01, the documented
# pathological input of the one-pass separator)
_syslogish = st.one_of(
    st.builds(
        lambda pri, day, host, app, pid, msg: (
            f"<{pri}>Oct {day} 22:14:15 {host} {app}{pid}: {msg}"
        ),
        st.integers(0, 999),
        st.integers(1, 31),
        st.sampled_from(["host1", "h", "a.example.com"]),
        st.sampled_from(["su", "cron", "app-x"]),
        st.sampled_from(["", "[230]", "[1]"]),
        st.text(
            st.characters(min_codepoint=32, max_codepoint=126), max_size=20
        ),
    ),
    st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=40),
)


@given(lines=st.lists(_syslogish, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_property_onepass_extract_equals_python_re(spark, lines):
    """_extract_all's anchored one-pass path returns exactly what Python
    `re` (and hence per-group regexp_extract) returns on arbitrary
    printable-ASCII lines: '' when the line does not match, '' for
    optional groups that did not participate, the captured text otherwise."""
    import re as _re

    from vector_spark.functions.parse import SYSLOG_3164, _extract_all

    compiled = _re.compile(SYSLOG_3164)
    names = list(compiled.groupindex)
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lines)], "i long, line string"
    )
    fields = _extract_all(F.col("line"), SYSLOG_3164)
    got = {
        r["i"]: tuple(r[n] for n in names)
        for r in df.select("i", *[fields[n].alias(n) for n in names]).collect()
    }
    for i, line in enumerate(lines):
        m = compiled.search(line)
        want = tuple(
            (m.group(n) or "") if m else "" for n in names
        )
        assert got[i] == want, (line, got[i], want)


@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    thresh=st.sampled_from([0.2, 0.5, 0.8]),
)
@settings(**SETTINGS)
def test_ngram_jaccard_matches_set_model(spark, texts, thresh):
    """counts AND prefix methods == the direct Python trigram-set model for
    any corpus over a tiny alphabet (dense shared grams — the case where
    prefix filtering prunes hardest and a pruning bug would show as a
    missing pair)."""
    from conftest import rows as _rows

    from vector_spark.datapipe import ngram_jaccard_pairs

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def tri(s):
        return {s[i:i + 3] for i in range(max(len(s) - 2, 1))}

    want = sorted(
        (a, b, j)
        for i, (a, ta) in enumerate(docs)
        for b, tb in docs[i + 1:]
        for j in [round(len(tri(ta) & tri(tb)) / len(tri(ta) | tri(tb)), 4)]
        if j >= thresh
    )
    for m in ("counts", "prefix", "bitmap"):
        got = sorted(_rows(ngram_jaccard_pairs(df, threshold=thresh, method=m),
                          "doc_a", "doc_b", "jaccard"))
        assert got == want, (m, texts, thresh)


# --- exact n-gram Jaccard: the four regimes agree with a Python model ------

_ngram_docs = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet="abcx ", max_size=12),
    ),
    min_size=2,
    max_size=8,
)


@given(docs=_ngram_docs, threshold=st.sampled_from([0.25, 0.5, 0.6, 1.0]))
@settings(**SETTINGS)
def test_ngram_jaccard_all_methods_match_python_model(spark, docs, threshold):
    """counts / prefix / bitmap / brute are IDENTICAL for any input
    (nulls included — treated as "") and any threshold in (0,1], and all
    match an independent Python trigram model. Pins the prefix-filter
    lemma (incl. the float-ceil guard) and the null-text contract."""
    from vector_spark.datapipe import ngram_jaccard_pairs

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id int, text string"
    )

    def tri(s):
        s = s or ""
        return {s[i:i + 3] for i in range(max(len(s) - 2, 1))}

    expect = []
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            ga, gb = tri(docs[a]), tri(docs[b])
            j = round(len(ga & gb) / len(ga | gb), 4)
            if j >= threshold:
                expect.append((a, b, j))
    expect.sort()

    for method in ("counts", "prefix", "bitmap", "brute"):
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in ngram_jaccard_pairs(
                df, threshold=threshold, method=method
            ).collect()
        )
        assert got == expect, (method, threshold, docs)


_kn_texts = st.lists(
    st.lists(st.sampled_from(["the", "cat", "sat", "dog", "ran", "a"]),
             min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(texts=_kn_texts)
@settings(**SETTINGS)
def test_kn_perplexity_matches_python_model(spark, texts):
    """Self-trained interpolated-KN bigram scores equal an independent
    python model (Chen & Goodman eq. 4.26 + Laplace continuation floor)
    for ANY corpus, including empty docs and repeated bigrams — pins the
    <s> sentinel, both CASE branches, and the rounding conventions."""
    from test_datapipe import _kn_python_model

    from vector_spark.datapipe import kn_perplexity

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_words, r.nll, r.bucket)
        for r in kn_perplexity(df, head=1.0, middle=1.5).collect()
    }
    toks = {i: [w for w in t.split() if w] for i, t in rows}
    want = _kn_python_model(
        toks, [ws for ws in toks.values() if ws], head=1.0, middle=1.5
    )
    assert got == want


docs_texts = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=5),
    min_size=2,
    max_size=10,
).map(lambda ws: [(i, " ".join(w)) for i, w in enumerate(ws)])


def _py_simhash(text: str, bits: int = 32) -> int:
    """Independent Python model of the md5-hex-parity simhash family."""
    import hashlib

    hs = [hashlib.md5(t.encode()).hexdigest() for t in dict.fromkeys(text.split(" "))]
    fp = 0
    for j in range(bits):
        vote = sum(1 if int(h[j], 16) % 2 else -1 for h in hs)
        if vote > 0:
            fp |= 1 << j
    return fp


@given(docs=docs_texts, d=st.sampled_from([1, 3]))
@settings(**SETTINGS)
def test_simhash_hamming_pairs_match_python_model(spark, docs, d):
    """Manku banded join == brute force over an independent Python
    simhash model, for any corpus and either block plan."""
    from vector_spark.datapipe import simhash_hamming_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {i: _py_simhash(t) for i, t in docs}
    ids = sorted(fps)
    brute = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fps[a] ^ fps[b]).count("1") <= d
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_hamming_pairs(df, max_hamming=d, bits=32, n_blocks=d + 3).collect()
    }
    assert got == brute


@given(
    fps=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=2, max_size=14),
    d=st.integers(1, 4),
)
@settings(**SETTINGS)
def test_hamming_pairs_64bit_match_brute_force(spark, fps, d):
    """The factored-out hamming-ball join == brute force for ARBITRARY
    64-bit fingerprints (any sign, any block plan) — the pigeonhole
    recall theorem exercised over the full signed-long range, including
    the bit-63 sign-extension windows."""
    from vector_spark.datapipe import hamming_pairs

    rows = [(i, f) for i, f in enumerate(fps)]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    mask = (1 << 64) - 1
    brute = {
        (a, b, bin((fa ^ fb) & mask).count("1"))
        for a, fa in rows
        for b, fb in rows
        if a < b and bin((fa ^ fb) & mask).count("1") <= d
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hamming_pairs(
            df, "fp", bits=64, max_hamming=d, n_blocks=min(d + 3, 8)
        ).collect()
    }
    assert got == brute


# --- lumberjack walker (functions/lumberjack.py) --------------------------

lj_events = st.lists(
    st.tuples(
        st.sampled_from([1, 2]),                       # protocol version
        st.integers(0, 2**32 - 1),                     # sequence number
        st.sampled_from(["D", "J"]),
        st.dictionaries(
            st.text(st.characters(codec="utf-8", exclude_characters="\x00"),
                    min_size=1, max_size=8),
            st.text(st.characters(codec="utf-8"), max_size=16),
            min_size=1, max_size=4,
        ),
    ),
    min_size=0, max_size=6,
)


@given(evs=lj_events, compress=st.booleans())
@settings(**{**SETTINGS, "max_examples": 60})
def test_lumberjack_walk_roundtrips_and_never_raises(evs, compress):
    """Driver-side walker property: encode(frames) decodes back exactly
    (D frames as field maps, J frames as the same JSON object), and
    TRUNCATION at any byte offset never raises — it yields a prefix of
    the full event list (the reference's not-enough-data contract)."""
    from vector_spark.functions.lumberjack import (
        _walk, encode_lumberjack_frames,
    )
    import json as _json

    blob = encode_lumberjack_frames(
        [(p, s, k, d) for p, s, k, d in evs], compress=compress
    )
    full: list = []
    _walk(blob, full)
    assert len(full) == len(evs)
    for (p, s, k, d), got in zip(evs, full):
        # compressed container frames are always v2 but inner frames keep
        # their own version byte
        assert got[0] == p and got[1] == s and got[2] == k
        if k == "D":
            assert got[3] == d
        else:
            assert _json.loads(got[4]) == d
    # truncation: sample a handful of cut points (full scan is O(n^2))
    for cut in range(0, len(blob), max(1, len(blob) // 7)):
        part: list = []
        _walk(blob[:cut], part)          # must not raise
        assert len(part) <= len(full)
        for a, b in zip(part, full):     # and must be a strict prefix
            assert a == b


# --- CRI line parse vs a python reference model ---------------------------

cri_lines = st.lists(
    st.tuples(
        st.sampled_from(["stdout", "stderr", "stdmix"]),
        st.sampled_from(["F", "P", "X"]),
        st.text(st.characters(codec="utf-8",
                              exclude_characters="\r\n\x00"), max_size=20),
    ),
    min_size=1, max_size=8,
)


@given(rows=cri_lines)
@settings(**SETTINGS)
def test_parse_cri_equals_python_model(spark, rows):
    """parse_cri vs an independent python re-implementation of
    cri.rs:146-183 (split at first three single spaces, stream/tag
    validation) over arbitrary message bytes incl. spaces and unicode."""
    from vector_spark.functions import parse_cri

    ts = "2024-05-06T07:08:09.123456Z"
    lines = [(i, f"{ts} {s} {t} {m}") for i, (s, t, m) in enumerate(rows)]

    def model(line):
        parts = line.split(" ", 3)
        if len(parts) != 4:
            return None
        _, stream, tag, msg = parts
        if stream not in ("stdout", "stderr") or tag not in ("F", "P"):
            return None
        return (msg[:-1] if msg.endswith("\n") else msg, stream, tag == "P")

    df = spark.createDataFrame(lines, "i long, line string")
    got = {
        r["i"]: r["r"]
        for r in df.select("i", parse_cri(F.col("line")).alias("r")).collect()
    }
    for i, (_, line) in enumerate(lines):
        exp = model(line)
        g = got[i]
        if exp is None:
            assert g["message"] is None
        else:
            assert (g["message"], g["stream"], g["partial"]) == exp


# --- prometheus remote-write + native proto roundtrips --------------------

pm_series = st.lists(
    st.tuples(
        st.text(st.characters(codec="utf-8", exclude_characters="\x00"),
                min_size=1, max_size=12),                       # metric name
        st.dictionaries(
            st.text(st.sampled_from("abcxyz_"), min_size=1, max_size=6),
            st.text(st.characters(codec="utf-8"), max_size=8),
            max_size=3,
        ),
        st.lists(st.tuples(
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.integers(0, 2**53),
        ), min_size=1, max_size=4),
    ),
    min_size=0, max_size=5,
)


@given(series=pm_series)
@settings(**{**SETTINGS, "max_examples": 50})
def test_prom_remote_write_encode_decode_identity(series):
    """snappy+prompb roundtrip: decode(encode(s)) flattens s exactly —
    __name__ never collides (it is stripped from the label map) and
    float64 values survive bit-exactly."""
    from vector_spark.functions import (
        decode_write_request, encode_write_request,
    )

    series = [(n, {k: v for k, v in lbl.items() if k != "__name__"}, ss)
              for n, lbl, ss in series]
    got = decode_write_request(encode_write_request(series))
    exp = [(n, lbl, float(v), int(t))
           for n, lbl, ss in series for v, t in ss]
    assert got == exp


np_logs = st.lists(
    st.dictionaries(
        st.text(st.sampled_from("abcdef_"), min_size=1, max_size=6),
        st.one_of(
            st.text(st.characters(codec="utf-8"), max_size=10).map(
                lambda s: s.encode()),
            st.integers(-2**63, 2**63 - 1),
            st.booleans(),
            st.none(),
        ),
        max_size=4,
    ),
    min_size=0, max_size=4,
)


@given(events=np_logs)
@settings(**{**SETTINGS, "max_examples": 50})
def test_native_proto_log_encode_decode_identity(events):
    """Native EventArray roundtrip vs the documented rendering model:
    bytes -> utf8 text, ints -> decimal text (explicit zeros preserved),
    bools -> true/false, null kind -> None."""
    from vector_spark.functions import decode_event_array, encode_native_logs

    out = decode_event_array(encode_native_logs(events))
    assert len(out) == len(events)
    for ev, row in zip(events, out):
        assert row[0] == "log"
        got = row[1]
        for k, v in ev.items():
            if v is None:
                assert got[k] is None
            elif isinstance(v, bool):
                assert got[k] == ("true" if v else "false")
            elif isinstance(v, int):
                assert got[k] == str(v)
            else:
                assert got[k] == v.decode("utf-8", errors="replace")


# --- r5 stats-format parsers vs python models ------------------------------

ecs_doc = st.fixed_dictionaries({
    "mem": st.one_of(st.none(), st.fixed_dictionaries({
        "usage": st.one_of(st.none(), st.integers(0, 2**40)),
        "limit": st.one_of(st.none(), st.integers(0, 2**40)),
        "cache": st.one_of(st.none(), st.integers(0, 2**30)),
        "pgfault": st.one_of(st.none(), st.integers(0, 2**30)),
    })),
    "online": st.integers(0, 4),
    "percpu": st.one_of(st.none(), st.lists(st.integers(0, 10**6),
                                            max_size=3)),
    "net": st.dictionaries(st.sampled_from(["eth0", "eth1", "lo"]),
                           st.fixed_dictionaries({
                               "rx_bytes": st.one_of(st.none(),
                                                     st.integers(0, 2**40)),
                               "tx_errors": st.one_of(st.none(),
                                                      st.integers(0, 100)),
                           }), max_size=2),
    "blkio": st.lists(st.tuples(st.integers(0, 259), st.integers(0, 64),
                                st.sampled_from(["Read", "Write", "Sync"]),
                                st.integers(0, 2**40)), max_size=3),
})


@given(d=ecs_doc)
@settings(**SETTINGS)
def test_parse_ecs_metrics_equals_python_model(spark, d):
    """parse_ecs_metrics vs an independent python re-derivation of
    parser.rs over arbitrary presence patterns: blkio per-entry rows,
    percpu bounded by online_cpus AND the array length, memory/network
    per-field presence gating."""
    import json as _json

    from vector_spark.functions import parse_ecs_metrics

    doc = {"c1": {"read": "2026-01-01T00:00:00.000000Z"}}
    c = doc["c1"]
    if d["mem"] is not None:
        m = {k: v for k, v in d["mem"].items()
             if v is not None and k in ("usage", "limit")}
        stats = {k: v for k, v in d["mem"].items()
                 if v is not None and k in ("cache", "pgfault")}
        if stats:
            m["stats"] = stats
        c["memory_stats"] = m
    c["cpu_stats"] = {"online_cpus": d["online"]}
    if d["percpu"] is not None:
        c["cpu_stats"]["cpu_usage"] = {"percpu_usage": d["percpu"]}
    if d["net"]:
        c["networks"] = {
            k: {f: v for f, v in ns.items() if v is not None}
            for k, ns in d["net"].items()
        }
    if d["blkio"]:
        c["blkio_stats"] = {"io_serviced_recursive": [
            {"major": ma, "minor": mi, "op": op, "value": v}
            for ma, mi, op, v in d["blkio"]
        ]}

    # independent model of the expected (name, device, op, cpu) -> value
    expect = {}
    for ma, mi, op, v in d["blkio"]:
        expect[("blkio_recursive_io_serviced_total", f"{ma}:{mi}",
                op.lower(), None)] = float(v)
    expect[("cpu_online_cpus", None, None, None)] = float(d["online"])
    if d["percpu"] is not None:
        for i in range(min(d["online"], len(d["percpu"]))):
            expect[("cpu_usage_percpu_jiffies_total", None, None,
                    str(i))] = float(d["percpu"][i])
    if d["mem"] is not None:
        names = {"usage": "memory_used_bytes", "limit": "memory_limit_bytes",
                 "cache": "memory_cache_bytes",
                 "pgfault": "memory_page_faults_total"}
        for k, v in d["mem"].items():
            if v is not None:
                expect[(names[k], None, None, None)] = float(v)
    net_names = {"rx_bytes": "network_receive_bytes_total",
                 "tx_errors": "network_transmit_errs_total"}
    for iface, ns in d["net"].items():
        for f, v in ns.items():
            if v is not None:
                expect[(net_names[f], iface, None, None)] = float(v)

    df = spark.createDataFrame([(_json.dumps(doc),)], "body string")
    out = df.select(
        F.explode(parse_ecs_metrics(F.col("body"))).alias("m")
    ).select("m.*").collect()
    # blkio emits one row PER ENTRY (duplicate (major,minor,op) keys
    # included) — compare as multisets of full rows
    from collections import Counter
    exp_counter = Counter()
    for ma, mi, op, v in d["blkio"]:
        exp_counter[("blkio_recursive_io_serviced_total", f"{ma}:{mi}",
                     op.lower(), None, float(v))] += 1
    for k, v in expect.items():
        if not k[0].startswith("blkio"):
            exp_counter[(*k, v)] += 1
    got_counter = Counter(
        (r["name"], r["device"], r["op"], r["cpu"], r["value"]) for r in out)
    assert got_counter == exp_counter


@given(
    drives=st.dictionaries(st.sampled_from(["/a", "/b"]),
                           st.tuples(st.integers(0, 2**40),
                                     st.integers(0, 2**40),
                                     st.integers(0, 2**40)), max_size=2),
    drop=st.sampled_from([None, "freeMem", "readOps", "id"]),
)
@settings(**SETTINGS)
def test_parse_eventstoredb_stats_model(spark, drives, drop):
    """All-or-nothing on required proc/sys fields; per-drive gauges keyed
    by the map path for any drive set."""
    import json as _json

    from vector_spark.functions import parse_eventstoredb_stats

    doc = {
        "proc": {"id": 3, "mem": 10,
                 "diskIo": {"readBytes": 1, "writtenBytes": 2,
                            "readOps": 4, "writeOps": 5}},
        "sys": {"freeMem": 6},
    }
    if drives:
        doc["sys"]["drive"] = {
            p: {"availableBytes": a, "totalBytes": t, "usedBytes": u}
            for p, (a, t, u) in drives.items()
        }
    if drop == "freeMem":
        del doc["sys"]["freeMem"]
    elif drop == "readOps":
        del doc["proc"]["diskIo"]["readOps"]
    elif drop == "id":
        del doc["proc"]["id"]

    df = spark.createDataFrame([(_json.dumps(doc),)], "body string")
    out = df.select(
        F.explode(parse_eventstoredb_stats(F.col("body"))).alias("m")
    ).select("m.*").collect()
    if drop is not None:
        assert out == []
        return
    assert len(out) == 6 + 3 * len(drives)
    got = {(r["name"], r["path"]): r["value"] for r in out}
    for p, (a, t, u) in drives.items():
        assert got[("disk_free_bytes", p)] == float(a)
        assert got[("disk_total_bytes", p)] == float(t)
        assert got[("disk_used_bytes", p)] == float(u)
    assert all(r["id"] == "3" for r in out)
