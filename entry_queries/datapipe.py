"""LLM training-data pipeline contract queries + oracles (dedup tiers, quality, corpus build, similarity, graph, multimodal)."""

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
    _wet_sql,
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


def q_dedup_simhash_hamming(spark, sf_dir):
    """Manku WWW'07 Hamming-distance near-dup pairs (6 blocks / C(6,3)=20
    combination keys over a 32-bit simhash, d<=3). The oracle is the
    brute-force all-pairs formulation — the pigeonhole theorem says the
    banded join must reproduce it exactly, so the oracle doubles as a
    recall proof."""
    from vector_spark.datapipe import simhash_hamming_pairs

    return simhash_hamming_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3, bits=32, n_blocks=6
    )


def q_c4_line_filter(spark, sf_dir):
    """C4 line-wise cleaning over deterministically synthesized multi-line
    pages: the single-line testdata docs are re-lined into 5-word lines,
    and line (doc_id+i)%3==0 gets terminal punctuation / (doc_id+i)%7==1
    gets a 'javascript.' tail — identical plant expressions on both
    engines, exercising the keep / terminal-punct / min-words /
    javascript-drop paths."""
    from vector_spark.datapipe import c4_line_filter

    d = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nlines = F.greatest(F.ceil(F.size(words) / F.lit(5)), F.lit(1)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.array_join(F.slice(words, i * 5 + 1, 5), " "),
    )
    planted = F.transform(
        lines,
        lambda l, i: F.concat(
            l,
            F.when((F.col("doc_id") + i) % 3 == 0, F.lit("."))
            .when((F.col("doc_id") + i) % 7 == 1, F.lit(" javascript."))
            .otherwise(F.lit("")),
        ),
    )
    staged = d.select("doc_id", F.array_join(planted, "\n").alias("text"))
    return c4_line_filter(staged)


def q_badwords_filter(spark, sf_dir):
    """C4's word-blocklist doc gate over the corpus with neutral stand-in
    entries that really occur in the fixture text ('slow', 'dup') plus one
    that never does ('stale'): whole-token matching on the shared
    lower/[^a-z0-9]+ tokenization — 'window' must never trip a 'win'
    entry. Scan-speed in-row fold; the oracle runs the identical
    tokenization through DuckDB's list lambdas."""
    from vector_spark.datapipe import badwords_filter

    return badwords_filter(
        _t(spark, sf_dir, "documents"), words=("slow", "dup", "stale")
    )


def q_split_corpus(spark, sf_dir):
    """Leakage-aware train/val split, group-disjoint by `source`: every
    doc of a source lands on one side (md5 prefix-mod arithmetic, same
    family as shuffle_corpus — the oracle reproduces it digit-by-digit)."""
    from vector_spark.datapipe import split_corpus

    d = _t(spark, sf_dir, "documents")
    return split_corpus(d, val_frac=0.25, group_col="source").select(
        "doc_id", "source", "split"
    )


def q_dedup_substrings(spark, sf_dir):
    """Exact substring dedup (Lee et al. 2022): every token inside an
    8-token window that occurs >= 2 times anywhere in the corpus is
    deleted; docs are reassembled from the survivors. The oracle is an
    independent DuckDB derivation (range/UNNEST + lambda interval cover)
    of the same duplicated-k-gram coverage semantics."""
    from vector_spark.datapipe import dedup_substrings

    return dedup_substrings(_t(spark, sf_dir, "documents"), k=8)


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


def q_mixture_temperature(spark, sf_dir):
    """Temperature-scaled data mixing (XLM-R/mT5 recipe): per-lang budgets
    derived from corpus token totals with p_g ~ n_g^(1/T) at T=2 — the
    low-resource langs get upweighted shares — then the same deterministic
    prefix-sum cut as mixture_sample. Budget math is integer-exact from
    rounded micro-unit weights (round(exp(ln(n)/T)*1e6)) so the oracle
    recomputes identical budgets in SQL."""
    from vector_spark.datapipe import mixture_sample, temperature_budgets

    d = _t(spark, sf_dir, "documents")
    budgets = temperature_budgets(d, total_tokens=4000, temperature=2.0)
    return mixture_sample(d, budgets)


def q_perplexity_bucket(spark, sf_dir):
    """CCNet-style LM quality scoring (unigram analogue, disclosed in
    lm.py): self-trained token counts, Laplace log10-probs, per-doc mean
    NLL, head/middle/tail buckets. Thresholds are the sf0.01 terciles so
    the bucket column genuinely three-ways the corpus at driver scale."""
    from vector_spark.datapipe import perplexity_score

    return perplexity_score(
        _t(spark, sf_dir, "documents"), head=1.4765, middle=1.4784
    )


def q_kn_perplexity(spark, sf_dir):
    """Interpolated Kneser-Ney BIGRAM perplexity (the KenLM smoothing
    family — lm.py:kn_perplexity) self-trained on the corpus with the
    `<s>` begin-of-doc sentinel context. Thresholds are the sf0.01
    terciles so the bucket column genuinely three-ways the corpus at
    driver scale."""
    from vector_spark.datapipe import kn_perplexity

    return kn_perplexity(
        _t(spark, sf_dir, "documents"), head=1.4648, middle=1.4753
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


def q_wet_extract(spark, sf_dir):
    """WARC -> WET derivation: each doc becomes a two-record WARC stream —
    a `response` block whose payload is a FULL HTTP message (status line +
    headers + the q_html_text planted page) framed by byte-exact
    Content-Length, plus a `metadata` block that must be skipped — then
    warc_to_wet frames, parses, strips the HTTP envelope, and extracts the
    text. The oracle reconstructs the expected conversion records directly
    from documents (ground truth by construction: the html_text regex
    chain over the same planted page, WET headers from doc_id arithmetic),
    so the framing walk, record parse, envelope strip, and extraction are
    what get verified."""
    from vector_spark.datapipe import warc_to_wet
    from vector_spark.session import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents"))
    i = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        i,
        F.lit(
            "</title><style>p {color: red}</style>"
            "<script>var t = 1 < 2;</script></head>"
            "<body><!-- crawler metadata -->"
            "<h1>Doc&nbsp;"
        ),
        i,
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><div>tail &amp;lt; end</div></body></html>"),
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\nServer: srv"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("\r\n\r\n"),
        html,
    )
    buf = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://crawl.example/d/"),
        i,
        F.lit("\r\nWARC-Date: 2024-03-01T12:00:00Z\r\nWARC-Record-ID: <urn:uuid:resp-"),
        i,
        F.lit(">\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\nWARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"),
    )
    out = warc_to_wet(d.select("doc_id", buf.alias("warc")), keep_cols=("doc_id",))
    return out.select(
        "doc_id",
        "rec_idx",
        "target_uri",
        F.unix_micros(F.col("warc_date")).alias("warc_date_us"),
        "refers_to",
        "text",
        "text_bytes",
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


def q_decontaminate_semantic(spark, sf_dir):
    """Embedding-tier decontamination (the semantic complement of the
    n-gram rule): every 97th embedding is the held-out benchmark; corpus
    vectors within 0.3 rounded-6 cosine of ANY benchmark vector are
    flagged. The whole benchmark rides ONE broadcast row and assignment is
    a narrow expression fold — zero corpus exchanges (see
    similarity.decontaminate_semantic). Threshold 0.3 sits between the p90
    and max of the max-cos distribution at both SFs, so keep carries real
    discrimination."""
    from vector_spark.datapipe import decontaminate_semantic

    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 97 == 3)
    corpus = emb.filter(F.col("vec_id") % 97 != 3)
    return decontaminate_semantic(corpus, bench, threshold=0.3)


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
    from vector_spark.session import ensure_parallelism

    # span split + per-span md5 on a one-split parquet scan: spread it at
    # the QUERY level (inside the op it would double-exchange callers like
    # curation_pipeline that already repartition+persist their input)
    return ensure_parallelism(_t(spark, sf_dir, "documents")).transform(
        lambda d: dedup_spans(d, span_words=3)
    )


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


def q_image_near_dup(spark, sf_dir):
    """Image near-dup: 64-byte fake 'images' (the aHash stub reads the
    payload as a pre-decoded 8x8 luma grid) -> aHash -> Manku hamming-ball
    join (6 blocks / 20 combo keys, d=3). The planted grid is two-level
    ('a'=97 / 'z'=122) with a pseudo-random per-group high set — the
    mean-threshold bit rule then selects EXACTLY the high positions for
    any high count (122*64 > 6208+25h for all h<64; 97*64 never), so the
    fingerprints, and therefore the qualifying pairs, are pure doc_id
    arithmetic the oracle recomputes brute-force (lo/hi 32-bit split +
    bit_count(xor)). Docs within a group of 5 differ only in their one
    perturbed position -> hamming <= 2; cross-group grids are ~28 apart."""
    from vector_spark.datapipe import image_near_dup
    from vector_spark.session import ensure_parallelism

    d = ensure_parallelism(_t(spark, sf_dir, "documents")).select("doc_id")
    g = F.floor(F.col("doc_id") / 5).cast("long")
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: F.when(
            ((g * 2654435761 + j * 40503) % 64 < 21) | (j == F.col("doc_id") % 5),
            F.lit("z"),
        ).otherwise(F.lit("a")),
    )
    imgs = d.select(
        "doc_id", F.encode(F.array_join(grid, ""), "UTF-8").alias("payload")
    )
    return image_near_dup(imgs, max_hamming=3, n_blocks=6)


def q_pages_pipeline(spark, sf_dir):
    # rows-only check: input is the deterministic generated pages table
    # (north-rule input shape), not a testdata parquet
    pages = generate_pages(spark, 20_000, partitions=8)
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))
    return out["sink_counts"]


# ---- oracle-checked flagship twins ---------------------------------------
# The north rule's correctness criteria are "exact routed-row equality per
# sink, matching per-sink aggregate counts, and byte-identical extracted
# text per url". q_pages_pipeline above runs the flagship over the
# xxhash64-generated table (rows-only — DuckDB has no xxhash64). These
# twins run the SAME pages_pipeline() plan over a pages-shaped reshape of
# the `events` testdata table whose every derivation (md5 slices) both
# engines compute identically, so all three criteria are verified
# hash-exact against the independent DuckDB re-derivation.

_PAGES_TLDS = ("com", "org", "net", "io", "dev", "edu")  # edu: no geo row
_PAGES_LANGS = ("en", "de", "fr", "es", "hi", "zh", "ja", "ru")  # ru: no dim row
_PAGES_STATUSES = (200, 200, 200, 301, 302, 404, 500, 503)  # 404 -> _unmatched
_PAGES_CTYPES = ("text/html", "application/json")


def _events_as_pages(spark, sf_dir):
    """events -> north-rule pages shape (url, warc_ts, html, text, lang).

    Every derived attribute is a slice of md5(event_id || '|' || tag) — the
    cross-engine deterministic idiom (CLAUDE.md oracle-portability rules) —
    so the DuckDB oracle rebuilds the identical input corpus from SQL.

    events.parquet is a single file (one scan split) at every SF — spread
    it so the md5 derivations + route explode use the whole machine."""
    from vector_spark.session import ensure_parallelism

    e = ensure_parallelism(_t(spark, sf_dir, "events"))

    def h(tag: str, mod: int):
        key = F.concat(F.col("event_id").cast("string"), F.lit("|" + tag))
        return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") % mod

    def pick(tag: str, vals):
        arr = F.array(*[F.lit(v) for v in vals])
        return F.element_at(arr, (h(tag, len(vals)) + 1).cast("int"))

    domain = F.concat(F.lit("domain"), h("d", 100).cast("string"))
    host = F.concat(domain, F.lit("."), pick("t", _PAGES_TLDS))
    status = pick("s", _PAGES_STATUSES)
    text = F.coalesce(F.col("props"), F.lit(""))
    html_str = F.concat(
        F.lit('<html><head><meta http-equiv="status" content="'),
        status.cast("string"),
        F.lit('"/><meta content-type="'), pick("c", _PAGES_CTYPES),
        F.lit('"/><title>Page '), F.col("event_id").cast("string"),
        F.lit("</title></head><body><p>"), text, F.lit("</p></body></html>"),
    )
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("event_id").cast("string"))
    return e.select(
        url.alias("url"),
        F.col("ts").cast("timestamp").alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        text.alias("text"),
        pick("l", _PAGES_LANGS).alias("lang"),
    )


def q_pages_routed(spark, sf_dir):
    """Routed-row equality per sink: one output row per (event, matching
    route) incl. `_unmatched`, with the untouched `text` passthrough —
    the north rule's byte-identical-extracted-text invariant rides the
    same hash compare."""
    out = pages_pipeline(_events_as_pages(spark, sf_dir), geo_dim(spark), lang_dim(spark))
    return out["routed"].select(
        "url", "route",
        F.col("status").cast("long").alias("status"),
        "lang", "lang_family", "geo_region", "text",
        F.col("html_bytes").cast("long").alias("html_bytes"),
    )


def q_pages_sink_counts(spark, sf_dir):
    """Per-sink windowed aggregate counts (route x 1h window x geo_region),
    hash-exact vs the oracle's independent parse->enrich->route->aggregate."""
    out = pages_pipeline(_events_as_pages(spark, sf_dir), geo_dim(spark), lang_dim(spark))
    return out["sink_counts"].select(
        "route", "window_start", "geo_region",
        F.col("events").cast("long").alias("events"),
        F.col("bytes").cast("long").alias("bytes"),
    )


def q_pages_domain_rollup(spark, sf_dir):
    """The salted two-phase hot-domain aggregate: verifies salting is
    result-invariant (phase-1 (domain, salt) partials re-merged == plain
    GROUP BY domain in the oracle)."""
    out = pages_pipeline(_events_as_pages(spark, sf_dir), geo_dim(spark), lang_dim(spark))
    return out["domain_rollup"].select(
        "domain",
        F.col("pages").cast("long").alias("pages"),
        F.col("bytes").cast("long").alias("bytes"),
    )


def q_pages_fused_sinks(spark, sf_dir):
    """The single-pass fan-out plan: both sinks' aggregates from one
    scan/parse/shuffle ('_domains' pseudo-route carries the rollup).
    Hash-exact vs the oracle's independent two-aggregate UNION."""
    out = pages_pipeline(_events_as_pages(spark, sf_dir), geo_dim(spark), lang_dim(spark))
    return out["fused_sinks"].select(
        "route", "domain", "window_start", "geo_region",
        F.col("events").cast("long").alias("events"),
        F.col("bytes").cast("long").alias("bytes"),
    )


# ---- VRL function surface -------------------------------------------------

def q_dedup_ngram_jaccard(spark, sf_dir):
    """EXACT character-trigram Jaccard near-dup pairs. The fixture corpus
    is the DENSE-VOCABULARY regime — 377 distinct trigrams over 5000 docs
    at sf0.1, median pairwise jaccard 0.45, 850k qualifying pairs (the
    output itself is Θ(n²)) — so the regime-matched plan is "bitmap":
    triangle-blocked cogroups doing numpy popcount matmuls, with the exact
    round(jaccard,4) filter applied Spark-side (measured: counts 19.4s,
    prefix times out — no prefix can prune when even the rarest gram hits
    ~300 docs — bitmap ~2s). Identical output to the brute-force all-pairs
    formulation (which the DuckDB oracle independently is); all methods
    are equality-tested."""
    from vector_spark.datapipe import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.6, method="bitmap"
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


def _planted_link_pages(spark, sf_dir):
    """documents -> pages with deterministically planted anchors, the
    extract_links/link_pagerank fixture. Every page carries 5 anchor
    elements exercising the whole resolution matrix: [0] absolute
    external with a tracking param + unsorted query, [1] single-quoted
    site-absolute path with a nested tag in the anchor text, [2] junk
    (#fragment / mailto: / javascript: round-robin — must be dropped),
    [3] bare relative path, UNQUOTED HTML5 attribute form (resolved
    against the /d/{id}/ base dir),
    [4] protocol-relative CDN asset. Hosts alternate 2-label .com and
    4-label www.*.co.uk so dst_domain exercises the ccTLD rule. All
    derivations are doc_id arithmetic — the DuckDB oracle rebuilds the
    expected LINK ROWS directly from the same arithmetic (ground truth
    by construction, zero regex), so the Spark side's extraction +
    resolution + normalization is what gets verified."""
    i = F.col("doc_id")
    s = lambda e: F.expr(e).cast("string")  # noqa: E731
    scheme = F.when(i % 4 == 0, F.lit("http")).otherwise(F.lit("https"))
    sidx = s("(doc_id div 7) % 23")
    host = F.when(
        i % 5 == 0, F.concat(F.lit("www.site"), sidx, F.lit(".co.uk"))
    ).otherwise(F.concat(F.lit("site"), sidx, F.lit(".com")))
    junk = (
        F.when(i % 3 == 0, F.lit('<a href="#frag">top</a>'))
        .when(i % 3 == 1, F.lit('<a href="mailto:a@b.c">mail</a>'))
        .otherwise(F.lit('<a href="javascript:void(0)">js</a>'))
    )
    html = F.concat(
        F.lit("<html><body><p>intro</p>"),
        F.lit('<a href="https://ext'), s("(doc_id div 3) % 11"),
        F.lit(".org/a/"), s("doc_id % 97"),
        F.lit('?utm_campaign=c&z=9&a=1">Ref '), s("doc_id"), F.lit("</a> mid "),
        F.lit("<a href='/p/"), s("doc_id % 9"), F.lit("'>sec <i>"),
        s("doc_id % 3"), F.lit("</i></a>"),
        junk,
        F.lit("<a href=rel"), s("doc_id % 4"), F.lit(".html class=plain>Rel "),
        s("doc_id % 5"), F.lit("</a>"),
        F.lit("<a href='//cdn"), s("doc_id % 5"), F.lit(".net/l.js'>cdn</a>"),
        F.lit("<a name='x'>no href</a></body></html>"),
    )
    url = F.concat(scheme, F.lit("://"), host, F.lit("/d/"), s("doc_id"), F.lit("/index.html"))
    return _t(spark, sf_dir, "documents").select("doc_id", url.alias("url"), html.alias("html"))


def q_extract_links(spark, sf_dir):
    """Hyperlink harvest: anchor elements -> href + tag-stripped anchor
    text -> RFC 3986 resolution against the page URL -> canonicalized
    dst (tracking params dropped, query sorted, registrable domain).
    Scan-speed pure expressions; the oracle is the by-construction
    ground truth (opposite formulations — see _planted_link_pages)."""
    from vector_spark.datapipe import extract_links

    return extract_links(_planted_link_pages(spark, sf_dir), keep_cols=("doc_id",)).select(
        "doc_id", "link_pos", "src_host", "dst_url", "dst_host",
        "dst_domain", "anchor", "is_internal",
    )


def q_link_pagerank(spark, sf_dir):
    """Crawl -> link graph -> authority: host-level edges from the REAL
    extracted links (self-loops = intra-site links kept), fixed-point
    integer PageRank (3 rounds, damping 85%) over the union node set.
    The oracle rebuilds the edge multiset from the fixture arithmetic and
    unrolls the same integer rounds with the true out-degree join."""
    from vector_spark.datapipe import extract_links, pagerank

    links = extract_links(_planted_link_pages(spark, sf_dir))
    edges = links.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    nodes = edges.select(F.col("src").alias("host")).union(
        edges.select(F.col("dst").alias("host"))
    ).distinct()
    return pagerank(nodes, edges, iterations=3, damping_pct=85, id_col="host")


def q_link_hits(spark, sf_dir):
    """Fixed-point integer HITS (2 rounds, L1-normalized micro-units) over
    the same host graph as link_pagerank: hubs = pages that link out to
    strong authorities, authorities = link targets of strong hubs. The
    oracle rebuilds the edge multiset from the fixture arithmetic and
    unrolls the identical integer half-rounds (sum -> *scale DIV total)."""
    from vector_spark.datapipe import extract_links, hits

    links = extract_links(_planted_link_pages(spark, sf_dir))
    edges = links.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    nodes = edges.select(F.col("src").alias("host")).union(
        edges.select(F.col("dst").alias("host"))
    ).distinct()
    return hits(nodes, edges, iterations=2, id_col="host")


def q_anchor_texts(spark, sf_dir):
    """Anchor-text dataset from the REAL extracted links: per destination
    host, in-link volume, distinct anchor vocabulary, and the top-3
    anchors (count DESC, anchor ASC — binary-order tie-break). The oracle
    aggregates the by-construction link rows with DuckDB's ordered-list
    idiom (list(... ORDER BY)[1:3]) vs Spark's struct-sort fold —
    independent formulations of the same top-k."""
    from vector_spark.datapipe import anchor_stats, extract_links

    return anchor_stats(
        extract_links(_planted_link_pages(spark, sf_dir)), by="dst_host", k=3
    )


def q_crawl_frontier(spark, sf_dir):
    """Frontier expansion: distinct not-yet-crawled URLs referenced by the
    corpus, ranked by reference count + distinct referring hosts, capped
    at 2 per destination host. The 'already crawled' set = the fixture
    pages PLUS their /p/ section pages, so the anti-join really removes
    the pos-1 targets (not just the trivially-new rest)."""
    from vector_spark.datapipe import crawl_frontier, extract_links

    pages = _planted_link_pages(spark, sf_dir)
    sec = pages.select(
        F.concat(
            F.regexp_extract("url", r"^(https?://[^/]+)/", 1),
            F.lit("/p/"),
            (F.col("doc_id") % 9).cast("string"),
        ).alias("url")
    )
    corpus_urls = pages.select("url").unionByName(sec)
    return crawl_frontier(
        extract_links(pages), corpus_urls, per_host_cap=2
    )


def q_sitemap_parse(spark, sf_dir):
    """Sitemap protocol parse over planted XML: docs with doc_id%5==0
    carry a <sitemapindex> (2 child sitemaps), the rest a <urlset> with 3
    <url> entries exercising the lastmod W3C-profile matrix (seconds+Z /
    date-only / absent), whitespace-padded <loc> (must trim), and
    present/absent changefreq+priority. The oracle rebuilds the entry rows
    from the same arithmetic (DuckDB strptime vs Spark try_to_timestamp —
    independent datetime parsers must land on the same epoch-us)."""
    from vector_spark.datapipe import parse_sitemap

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    s = lambda e: F.expr(e).cast("string")  # noqa: E731
    host = F.concat(F.lit("site"), s("doc_id % 23"), F.lit(".example"))
    freq = F.element_at(
        F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")), (i % 3 + 1).cast("int")
    )
    urlset = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc>  https://'), host,
        F.lit("/p/"), s("doc_id % 9"),
        F.lit("\n</loc><lastmod>2024-03-0"), s("1 + doc_id % 9"),
        F.lit("T1"), s("doc_id % 10"),
        F.lit(":30:00Z</lastmod><changefreq>"), freq,
        F.lit("</changefreq><priority>0."), s("doc_id % 10"),
        F.lit("</priority></url><url><loc>https://"), host,
        F.lit("/a/"), s("doc_id % 97"),
        F.lit("</loc><lastmod>2024-02-"), s("10 + doc_id % 18"),
        F.lit("</lastmod></url><url><loc>https://"), host,
        F.lit("/static/about</loc></url></urlset>"),
    )
    index = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex><sitemap><loc>https://'), host,
        F.lit("/sitemap-"), s("doc_id % 7"),
        F.lit(".xml</loc><lastmod>2024-01-2"), s("doc_id % 8"),
        F.lit("T09:0"), s("doc_id % 6"),
        F.lit(":00Z</lastmod></sitemap><sitemap><loc>https://"), host,
        F.lit("/sitemap-news.xml</loc></sitemap></sitemapindex>"),
    )
    xml = F.when(i % 5 == 0, index).otherwise(urlset)
    out = parse_sitemap(
        d.select("doc_id", host.alias("host"), xml.alias("xml")),
        keep_cols=("doc_id", "host"),
    )
    return out.select(
        "doc_id", "host", "entry_pos", "kind", "loc",
        F.unix_micros(F.col("lastmod")).alias("lastmod_us"),
        "changefreq", "priority",
    )


def q_harmonic_centrality(spark, sf_dir):
    """HyperBall truncated harmonic centrality (radius 2, p=12) over the
    host graph of the REAL extracted links — the Common Crawl host-rank
    recipe. The oracle computes the EXACT in-balls with unrolled joins
    over the by-construction edge set, sketches them with the identical
    md5 register math, and applies the same integer shell arithmetic:
    register-max merging is lossless, so the iterated Spark state must
    equal the sketch of the exact ball, hash-exactly."""
    from vector_spark.datapipe import extract_links, harmonic_centrality

    links = extract_links(_planted_link_pages(spark, sf_dir))
    edges = links.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    nodes = edges.select(F.col("src").alias("host")).union(
        edges.select(F.col("dst").alias("host"))
    ).distinct()
    return harmonic_centrality(nodes, edges, radius=2, id_col="host")


def q_bpe_pair_counts(spark, sf_dir):
    """One BPE-training merge round: corpus-wide adjacent-char pair counts
    weighted by word frequency; rank 1 = the merge BPE performs next."""
    from vector_spark.datapipe import bpe_pair_counts

    return bpe_pair_counts(_t(spark, sf_dir, "documents"), top_n=50)


# Static fixture word frequencies for the bpe_encode contract: the merge
# table must be embeddable as literals in BOTH engines, so it is learned
# (deterministically, by datapipe.bpe.bpe_learn_py — Sennrich §3.2 with
# count-desc/pair-asc tie-breaks) from this fixed dictionary rather than
# from the parquet corpus. Learning-from-corpus is covered by bpe_learn's
# unit tests; ENCODING is what the oracle verifies end-to-end here.
_BPE_FIXTURE_FREQS = {
    "the": 50, "fast": 20, "faster": 8, "fastest": 4, "key": 18, "order": 15,
    "ordered": 6, "sort": 22, "sorted": 9, "table": 25, "tables": 7,
    "scan": 21, "scans": 5, "merge": 19, "merges": 6, "merged": 4,
    "window": 14, "windows": 3, "stream": 16, "streams": 4, "batch": 24,
    "batches": 5, "spark": 30, "join": 28, "joins": 6, "filter": 17,
    "filters": 4, "group": 13, "groups": 3, "query": 12, "queries": 4,
}
_BPE_NUM_MERGES = 40


def _bpe_merges() -> list[tuple[str, str]]:
    from vector_spark.datapipe.bpe import bpe_learn_py

    return bpe_learn_py(_BPE_FIXTURE_FREQS, _BPE_NUM_MERGES)


def q_bpe_encode(spark, sf_dir):
    """Deterministic BPE encode (closes the tokenizer loop around
    bpe_pair_counts): apply the fixture-learned merge table to every
    document, emit token count + md5 of the token sequence. Zero-shuffle
    Arrow pandas UDF with per-batch word memo (datapipe/bpe.py). Oracle:
    an independent one-merge-per-step recursive-CTE encoder in DuckDB over
    the same merge table (equivalent to the all-occurrences apply loop for
    any CONSISTENT learned table — a pair containing a merged token always
    ranks after the merge that created it)."""
    from vector_spark.datapipe.bpe import bpe_encode

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    out = bpe_encode(docs, _bpe_merges())
    return out.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws("\x1f", "tokens")).alias("tokens_md5"),
    )


_BPE_TOKENS_TAIL = """
SELECT d.doc_id,
       CAST(coalesce(len(p.all_toks), 0) AS BIGINT) AS n_tokens,
       md5(coalesce(array_to_string(p.all_toks, chr(31)), '')) AS tokens_md5
FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
"""

# vocab = distinct emitted subwords, dense ids in lexicographic order; ids
# rendered ':'-joined and md5'd — the exact arithmetic of q_bpe_token_ids
_BPE_IDS_TAIL = """,
vocab AS (
  SELECT tok AS token,
         CAST(row_number() OVER (ORDER BY tok) - 1 AS INTEGER) AS token_id
  FROM (SELECT DISTINCT unnest(toks) AS tok FROM final)
),
vm AS (
  SELECT map(list(token ORDER BY token), list(token_id ORDER BY token)) AS vmap
  FROM vocab
),
ids AS (
  SELECT p.doc_id,
         list_transform(p.all_toks, t -> map_extract(vm.vmap, t)[1]) AS tid
  FROM perdoc p, vm
)
SELECT d.doc_id,
       CAST(coalesce(len(i.tid), 0) AS BIGINT) AS n_tokens,
       md5(coalesce(array_to_string(i.tid, ':'), '')) AS ids_md5
FROM documents d LEFT JOIN ids i ON i.doc_id = d.doc_id
"""


def _bpe_encode_sql(tail: str = _BPE_TOKENS_TAIL, doc_source: str = "documents") -> str:
    # doc_source: any relation (or parenthesized subquery) with (doc_id,
    # text) — lets composed oracles (dataset_build) run the encoder over a
    # derived stage instead of the raw table
    merges = _bpe_merges()
    keys = ", ".join(f"'{a}' || chr(2) || '{b}'" for a, b in merges)
    ranks = ", ".join(str(i) for i in range(len(merges)))
    big = 10**9
    tail_sql = tail.replace("FROM documents d", f"FROM {doc_source} d")
    cand = (
        "list_sort(list_transform(range(1, len(toks)), i -> "
        f"{{'rk': coalesce(map_extract(mm, toks[i] || chr(2) || toks[i+1])[1], {big}), "
        "'p': i}))[1]"
    )
    return f"""
WITH RECURSIVE
m AS (SELECT map([{keys}], [{ranks}]) AS mm),
docs AS (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS ws
  FROM {doc_source} _src
),
wordpos AS (
  SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS pos FROM docs
),
words AS (SELECT DISTINCT w FROM wordpos),
enc(w, toks) AS (
  SELECT w, list_transform(range(1, len(w)+1), i -> w[i]) FROM words
  UNION ALL
  SELECT w, toks[1:best.p-1] || [toks[best.p] || toks[best.p+1]] || toks[best.p+2:len(toks)]
  FROM (SELECT w, toks, {cand} AS best FROM enc, m)
  WHERE best.rk < {big}
),
final AS (
  SELECT w, toks FROM (
    SELECT w, toks, coalesce(({cand}).rk, {big}) AS brk FROM enc, m
  ) WHERE brk >= {big}
),
perdoc AS (
  SELECT wp.doc_id, flatten(list(f.toks ORDER BY wp.pos)) AS all_toks
  FROM wordpos wp JOIN final f ON f.w = wp.w
  GROUP BY wp.doc_id
){tail_sql}"""


def q_bpe_token_ids(spark, sf_dir):
    """Tokenize straight to training-shard TOKEN IDS: corpus-induced vocab
    (dense lexicographic ids) + the fused encode+lookup Arrow walk. The
    oracle re-derives the identical vocab with a row_number window over
    the recursive-CTE encoder's distinct subwords."""
    from vector_spark.datapipe import bpe_token_ids, bpe_vocab

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    merges = _bpe_merges()
    vocab = {r.token: r.token_id for r in bpe_vocab(docs, merges).collect()}
    ids = bpe_token_ids(docs, merges, vocab)
    joined = F.concat_ws(
        ":", F.transform("token_ids", lambda t: t.cast("string"))
    )
    return ids.select(
        "doc_id",
        F.size("token_ids").cast("long").alias("n_tokens"),
        F.md5(joined.cast("binary")).alias("ids_md5"),
    )


def q_pack_sequences_bpe(spark, sf_dir):
    """Token-EXACT sequence packing: bpe_encode's real subword counts feed
    pack_sequences (n_tokens_col) instead of the whitespace approximation —
    the composed tokenizer->packing loop a training pipeline runs. Oracle:
    the recursive-CTE BPE encoder's per-doc counts composed into the same
    packing SQL."""
    from vector_spark.datapipe import bpe_encode, pack_sequences

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    enc = bpe_encode(docs, _bpe_merges()).withColumn(
        "n_bpe", F.size("tokens").cast("long")
    )
    return pack_sequences(
        enc.select("doc_id", "text", "n_bpe"), seq_len=64, n_tokens_col="n_bpe"
    )


def q_dataset_build(spark, sf_dir):
    """Round-4 composed dataset build: substring dedup -> group-disjoint
    split -> BPE-exact token counts -> train-side packing, hash-exact end
    to end (the oracle re-roots each stage's SQL onto the previous
    stage's output, ending in the shared packing arithmetic)."""
    from vector_spark.datapipe import dataset_build

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    return dataset_build(
        docs.select("doc_id", "text", "source"),
        _bpe_merges(),
        k=8,
        val_frac=0.25,
        group_col="source",
        seq_len=64,
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup: 16 deterministic centroids (lowest-id seeds + one
    DECIMAL-exact Lloyd round), argmax-cosine clustering, then
    within-cluster cosine pruning (lowest id survives a >=0.35 pair).
    Every row comes back with its cluster + centroid cosine + keep flag."""
    from vector_spark.datapipe import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, n_centroids=16
    )


def q_embedding_outliers(spark, sf_dir):
    """Prototypicality gate (Sorscher et al. 2022): cosine of every vector
    to its Lloyd-refined assigned centroid; keep=false below 0.2. Same
    deterministic centroid arithmetic as semantic_dedup/ann_ivf, so the
    oracle reuses the shared Lloyd CTE verbatim."""
    from vector_spark.datapipe import embedding_outliers

    return embedding_outliers(
        _t(spark, sf_dir, "embeddings"), n_centroids=16, min_cos=0.2
    )


def q_ann_ivf(spark, sf_dir):
    from vector_spark.datapipe import ivf_ann_topk

    return ivf_ann_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[100, 101, 102],
        k=5, n_centroids=16, n_probe=4,
    ).withColumn("rank", F.col("rank").cast("long"))


def q_multimodal_features(spark, sf_dir):
    """Media feature-extraction plumbing (stubbed codec, real Arrow path)
    -> embedding column consumable by the ANN operators. Hash-exact
    since r5: the payload is sanitized to printable ASCII (chars ==
    bytes, so DuckDB's VARCHAR-only md5 sees the identical byte stream)
    and at dims=16 the md5-seeded stub is one digest whose bytes map to
    values b/127.5-1.0 — the oracle re-derives the digest and the fold
    sum with hex-nibble arithmetic."""
    from vector_spark.datapipe import extract_features

    d = _t(spark, sf_dir, "documents").withColumn(
        "payload",
        F.encode(F.regexp_replace("text", r"[^ -~]", ""), "UTF-8"),
    )
    feats = extract_features(d, dims=16)
    return feats.select(
        "doc_id",
        F.size("embedding").alias("dims"),
        F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x), 4).alias("feat_sum"),
    )


def q_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing (1->N Arrow expansion); hash-exact
    since r5 — the stub fingerprint is md5-over-hex, oracle re-derives
    offsets via DuckDB range() and the same md5."""
    from vector_spark.datapipe import frame_sample

    d = _t(spark, sf_dir, "documents").withColumn("payload", F.encode("text", "UTF-8"))
    return frame_sample(d, every_ms=1000).select(
        "doc_id", "frame_idx", "offset_ms", "frame_sha"
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


def q_dedup_bloom(spark, sf_dir):
    """Bloom-filter membership dedup (Dolma-style): docs with
    doc_id % 5 == 0 play the new snapshot, the rest the corpus. The filter
    is built as a sparse (word_idx, word_bits) table — the shuffle carries
    k=5 16-byte position rows per doc, never text — then broadcast to the
    probe. Deterministic md5 hash family, so the oracle reproduces the
    exact bit table and the result is hash-exact (not just a rate check).
    No false negatives by construction (pinned in tests); false positives
    bounded by m=2^20 bits over ~0.8k-80k corpus docs."""
    from vector_spark.datapipe import bloom_filter_build, bloom_filter_probe

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    delta = d.filter(F.col("doc_id") % 5 == 0)
    bloom = bloom_filter_build(corpus, "text")
    return bloom_filter_probe(delta, bloom, "text", "doc_id")


def q_freq_sketch(spark, sf_dir):
    """Count-min frequency sketch: build over ~350 distinct
    (event_type, user-bucket) values, then estimate every distinct value
    and join the exact count. Deterministic md5 position family -> the
    oracle rebuilds the identical cell table, making over-counts (hash
    collisions) hash-exact rather than just bounded. est >= exact is the
    count-min guarantee (pinned in tests)."""
    from vector_spark.datapipe import count_min_build, count_min_estimate

    e = _t(spark, sf_dir, "events").select(
        F.concat("event_type", F.lit("#"),
                 (F.col("user_id") % 50).cast("string")).alias("v"))
    sketch = count_min_build(e, "v")
    est = count_min_estimate(e.distinct(), sketch, "v")
    exact = e.groupBy("v").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        est.join(exact, "v")
        .select(F.col("v").alias("value"), "est_count", "exact_count")
    )


def q_heavy_hitters(spark, sf_dir):
    """phi-heavy-hitters over event_type (exact counts + share; the
    partial-agg-friendly exchange shape documented in datapipe/freq.py)."""
    from vector_spark.datapipe import heavy_hitters

    return heavy_hitters(_t(spark, sf_dir, "events"), "event_type",
                         min_share=0.05)


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct count of (event_type, user) pairs next to the
    exact count. The register table and the harmonic sum are integer-exact
    in both engines (md5 buckets, length(bin()) rank, power-of-two BIGINT
    sum); only the final division / linear-counting ln are floating,
    rounded to 4 decimals. At production scale the same query maintains a
    2^p-row register table instead of a distinct-shuffle over the corpus;
    sketches merge by bucket-max (hll_merge, tested)."""
    from vector_spark.datapipe import hll_estimate, hll_sketch

    e = _t(spark, sf_dir, "events").select(
        F.concat("event_type", F.lit("#"),
                 F.col("user_id").cast("string")).alias("v"))
    est = hll_estimate(hll_sketch(e, "v"))
    exact = e.agg(F.countDistinct("v").alias("n_exact"))
    return est.crossJoin(exact)


def q_hll_grouped(spark, sf_dir):
    """Per-group HLL: distinct users per event_type next to the exact
    count — the approx-distinct rollup a telemetry pipeline maintains per
    dimension. One register table per group (groups x 2^p rows total),
    map-side MAX partials, so the exchange cost is independent of corpus
    size — the scale contrast to count_distinct, whose exchange carries
    every distinct value. Same integer-exact register math as
    hll_distinct (md5 buckets, length(bin()) rank, power-of-two BIGINT
    harmonic sum), so the DuckDB oracle reproduces estimates bit-for-bit."""
    from vector_spark.datapipe import hll_estimate, hll_sketch

    e = _t(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("v"))
    est = hll_estimate(
        hll_sketch(e, "v", group_cols=["event_type"]),
        group_cols=["event_type"])
    exact = e.groupBy("event_type").agg(F.countDistinct("v").alias("n_exact"))
    return est.join(exact, "event_type")


def q_hll_windowed(spark, sf_dir):
    """Tumbling-window approx distinct: distinct users per 6-hour window —
    the windowed rollup an aggregate transform maintains per metric
    series, with HLL registers instead of a distinct-shuffle. The window
    key is an epoch-us bucket (engine-portable per the repo's timestamp
    convention); integer DIV keeps the bucket math exact in both engines.
    State: (windows x 2^p) register rows — the streaming twin
    (stream_hll_sketch group_cols=) maintains the same table with
    bounded state."""
    from vector_spark.datapipe import hll_estimate, hll_sketch

    six_h_us = 6 * 3600 * 1_000_000
    e = _t(spark, sf_dir, "events").select(
        (F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
         .cast("long").alias("_us")),
        F.col("user_id").cast("string").alias("v"),
    ).select(
        (F.expr(f"_us DIV {six_h_us}") * six_h_us).alias("window_start_us"),
        "v",
    )
    est = hll_estimate(
        hll_sketch(e, "v", group_cols=["window_start_us"]),
        group_cols=["window_start_us"])
    exact = e.groupBy("window_start_us").agg(
        F.countDistinct("v").alias("n_exact"))
    return est.join(exact, "window_start_us")


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




def q_robots_discovery(spark, sf_dir):
    """robots.txt discovery directives: `Sitemap:` lines are
    group-INDEPENDENT (planted both before and after the groups — both
    must surface), `Crawl-delay:` is group-SCOPED (the bot group's delay
    must NOT leak into the `*` resolution; hosts with two applicable star
    groups take the most conservative = max; 'bogus' values drop). Output
    joins the two per-host directive sets."""
    from vector_spark.datapipe import robots_crawl_delay, robots_sitemaps

    d = _t(spark, sf_dir, "documents")
    hosts = d.select(F.col("source").alias("host")).distinct()
    hu = F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10).cast("long")
    delay_line = (
        F.when(hu % 4 == 0, F.lit("Crawl-delay: 2.5\n"))
        .when(hu % 4 == 1, F.lit("Crawl-delay: 3\n"))
        .when(hu % 4 == 2, F.lit("Crawl-delay: bogus\n"))
        .otherwise(F.lit(""))
    )
    extra_group = F.when(
        hu % 5 == 0, F.lit("\nUser-agent: *\nCrawl-delay: 10\nDisallow: /tmp")
    ).otherwise(F.lit(""))
    content = F.concat(
        F.lit("Sitemap: https://"), F.col("host"), F.lit("/sm-"),
        (hu % 7).cast("string"), F.lit(".xml\n"),
        F.lit("User-agent: bot\nCrawl-delay: 1\nDisallow: /\n"),
        F.lit("User-agent: *\n"), delay_line, F.lit("Disallow: /x"),
        extra_group,
        F.lit("\nSitemap: https://"), F.col("host"), F.lit("/sm-extra.xml"),
    )
    robots = hosts.select("host", content.alias("robots_txt"))
    return robots_sitemaps(robots).join(
        robots_crawl_delay(robots, agent="*"), "host", "left"
    ).select("host", "sitemap_url", "crawl_delay")


def _hll_est_sql(vals_select: str, group: str | None = None) -> str:
    """Generate the DuckDB HLL register/estimate oracle from a `vals`
    projection (must expose column v, plus `group` when set). Constants
    mirror datapipe.freq.hll_sketch/hll_estimate at p=12 exactly — md5
    60-bit prefix, low-12-bit bucket, 49-bit rank via length(bin()),
    power-of-two BIGINT harmonic sum, 2.5m linear-counting cutover, the
    repr-round-tripped alpha*m^2*2^49 numerator — so a constant change
    is a ONE-place edit on each side."""
    m = 1 << 12
    alpha = 0.7213 / (1 + 1.079 / m)
    num = repr(alpha * m * m * float(1 << 49))
    g = f"{group}, " if group else ""
    gby2 = "GROUP BY 1, 2" if group else "GROUP BY 1"
    gby1 = "GROUP BY 1" if group else ""
    if group:
        tail = f"""SELECT e.{group},
       round(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                  THEN {m}.0 * ln({m}.0 / zeros) ELSE raw END, 4) AS n_est,
       x.n_exact
FROM est e
JOIN (SELECT {group}, count(DISTINCT v) AS n_exact
      FROM vals GROUP BY 1) x USING ({group})"""
    else:
        tail = f"""SELECT round(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                  THEN {m}.0 * ln({m}.0 / zeros) ELSE raw END, 4) AS n_est,
       (SELECT count(DISTINCT v) FROM vals) AS n_exact
FROM est"""
    return f"""
WITH vals AS ({vals_select}),
hs AS (
  SELECT {g}('0x' || substr(md5(v), 1, 15))::BIGINT AS h FROM vals
),
regs AS (
  SELECT {g}h % {m} AS bucket,
         max(CASE WHEN (h >> 12) > 0 THEN 49 - length(bin(h >> 12))
                  ELSE 49 END) AS max_rho
  FROM hs {gby2}
),
agg AS (
  SELECT {g}sum(1::BIGINT << (49 - max_rho)) AS s_present,
         count(*) AS n_present
  FROM regs {gby1}
),
est AS (
  SELECT {g}{num} / CAST(s_present
           + ({m} - n_present) * (1::BIGINT << 49) AS DOUBLE) AS raw,
         CAST({m} - n_present AS DOUBLE) AS zeros
  FROM agg
)
{tail}
"""


def _pages_oracle_cte() -> str:
    """DuckDB re-derivation of the flagship input + parse + enrich + route.

    Rebuilds the identical pages corpus from `events` (same md5-slice
    derivations as _events_as_pages), then independently re-parses the
    html/url it built, joins the inline dim VALUES, and re-applies the
    multi-match route semantics (list_filter + unnest lateral, empty ->
    ['_unmatched']) — a from-scratch SQL formulation of plans/pages.py,
    not a transliteration of the Spark plan."""

    def hsql(tag: str, mod: int) -> str:
        return (
            "('0x' || substr(md5(CAST(event_id AS VARCHAR) || '|" + tag + "'), 1, 15))"
            f"::BIGINT % {mod}"
        )

    def pick(tag: str, vals, quote: bool) -> str:
        lit = ", ".join((f"'{v}'" if quote else str(v)) for v in vals)
        return f"([{lit}])[CAST({hsql(tag, len(vals))} AS INT) + 1]"

    tlds = pick("t", _PAGES_TLDS, True)
    langs = pick("l", _PAGES_LANGS, True)
    statuses = pick("s", _PAGES_STATUSES, False)
    ctypes = pick("c", _PAGES_CTYPES, True)
    geo_rows = "('com','na'),('org','na'),('net','eu'),('io','eu'),('dev','apac'),('XYZ','na')"
    lang_rows = (
        "('en','germanic'),('de','germanic'),('fr','romance'),('es','romance'),"
        "('hi','indo-aryan'),('zh','sinitic'),('ja','japonic')"
    )
    route_list = (
        "list_filter(["
        "CASE WHEN status >= 500 THEN 'errors' END, "
        "CASE WHEN status >= 300 AND status < 400 THEN 'redirects' END, "
        "CASE WHEN status = 200 AND lang = 'en' THEN 'ok_en' END, "
        "CASE WHEN status = 200 AND lang <> 'en' THEN 'other_ok' END"
        "], x -> x IS NOT NULL)"
    )
    return f"""
base AS (
  SELECT event_id, ts, coalesce(props, '') AS text, {langs} AS lang,
         'domain' || CAST({hsql("d", 100)} AS VARCHAR) || '.' || {tlds} AS host,
         {statuses} AS status_gen, {ctypes} AS ctype
  FROM events
),
built AS (
  SELECT event_id, ts, text, lang,
         'https://' || host || '/p/' || CAST(event_id AS VARCHAR) AS url,
         '<html><head><meta http-equiv="status" content="' || CAST(status_gen AS VARCHAR)
           || '"/><meta content-type="' || ctype || '"/><title>Page '
           || CAST(event_id AS VARCHAR) || '</title></head><body><p>' || text
           || '</p></body></html>' AS html
  FROM base
),
parsed AS (
  SELECT url, ts, text, lang,
         regexp_extract(url, 'https://([^/]+)', 1) AS domain,
         regexp_extract(regexp_extract(url, 'https://([^/]+)', 1), '([^.]+)$', 1) AS tld,
         TRY_CAST(regexp_extract(html, 'status" content="(\\d+)"', 1) AS BIGINT) AS status,
         CAST(octet_length(encode(html)) AS BIGINT) AS html_bytes
  FROM built
),
enriched AS (
  SELECT p.*, g.geo_region, l.lang_family
  FROM parsed p
  LEFT JOIN (VALUES {geo_rows}) g(tld, geo_region) ON g.tld = p.tld
  LEFT JOIN (VALUES {lang_rows}) l(lang, lang_family) ON l.lang = p.lang
),
routed AS (
  SELECT e.*, r.route
  FROM enriched e,
       unnest(CASE WHEN len({route_list}) = 0 THEN ['_unmatched']
                   ELSE {route_list} END) AS r(route)
)"""


def q_embedding_quantize(spark, sf_dir):
    """INT8 scalar quantization of the embedding column — the ANN index
    build map (similarity.py::quantize_embeddings). The whole quantized
    vector is pinned via an md5 over its comma-joined values (both
    engines render int32 identically); scale and the integer norm ride
    alongside. floor(x*127/mx + 0.5) is IEEE-exact in both engines —
    this oracle is hash-exact, not approximate."""
    from vector_spark.datapipe import quantize_embeddings

    qz = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return qz.select(
        "vec_id",
        F.col("scale").alias("scale"),
        F.md5(F.array_join(
            F.transform("qvec", lambda x: x.cast("string")), ",")).alias("q_md5"),
        F.aggregate(
            "qvec", F.lit(0).cast("long"),
            lambda acc, x: acc + (x * x).cast("long"),
        ).alias("qnorm"),
    )


def q_ann_quantized(spark, sf_dir):
    """Brute-force cosine top-k over the int8-quantized index
    (similarity.py::quantized_cosine_topk): per-vector scales cancel, so
    scores derive from integer dot products only and the ranking is
    engine-exact (rounded-6 + id tiebreak, the cosine_topk contract)."""
    from vector_spark.datapipe import quantized_cosine_topk

    return quantized_cosine_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5
    ).withColumn("rank", F.col("rank").cast("long"))


def oracles() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["pages_routed"] = f"""
WITH {_pages_oracle_cte()}
SELECT url, route, status, lang, lang_family, geo_region, text, html_bytes
FROM routed
"""

    sql["pages_sink_counts"] = f"""
WITH {_pages_oracle_cte()}
SELECT route, CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
       geo_region, count(*) AS events, CAST(sum(html_bytes) AS BIGINT) AS bytes
FROM routed
GROUP BY 1, 2, 3
"""

    sql["pages_domain_rollup"] = f"""
WITH {_pages_oracle_cte()}
SELECT domain, count(*) AS pages, CAST(sum(html_bytes) AS BIGINT) AS bytes
FROM parsed
GROUP BY domain
"""

    sql["pages_fused_sinks"] = f"""
WITH {_pages_oracle_cte()}
SELECT route, CAST(NULL AS VARCHAR) AS domain,
       CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
       geo_region, count(*) AS events, CAST(sum(html_bytes) AS BIGINT) AS bytes
FROM routed GROUP BY 1, 3, 4
UNION ALL
SELECT '_domains', domain, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
       count(*), CAST(sum(html_bytes) AS BIGINT)
FROM parsed GROUP BY 2
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

    # independent formulation on purpose: the Spark side joins on the 20
    # Manku block-combination keys; the oracle recomputes the pair set by
    # brute force (all-pairs xor/bit_count). Equality IS the pigeonhole
    # recall theorem for this fingerprint family.
    sql["dedup_simhash_hamming"] = f"""
WITH fp AS ({_simhash_sql(32)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""

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

    # C4 line rules over the same line-plant arithmetic as the Spark query
    sql["c4_line_filter"] = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
ln AS (
  SELECT doc_id,
         [array_to_string(ws[i*5+1 : i*5+5], ' ') ||
            CASE WHEN (doc_id + i) % 3 = 0 THEN '.'
                 WHEN (doc_id + i) % 7 = 1 THEN ' javascript.'
                 ELSE '' END
          FOR i IN range(0, greatest(CAST(ceil(len(ws) / 5.0) AS BIGINT), 1))] AS lines
  FROM w
),
k AS (
  SELECT doc_id, lines,
         list_filter(lines, l ->
           regexp_matches(rtrim(l), '[.!?"”]$')
           AND len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
           AND NOT contains(lower(l), 'javascript')) AS kept,
         lower(array_to_string(lines, chr(10))) AS low
  FROM ln
)
SELECT doc_id,
       coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       (len(kept) >= 3 AND NOT contains(low, 'lorem ipsum')
         AND NOT contains(low, '{')) AS keep
FROM k
"""

    # badwords gate: identical tokenization (lower + [^a-z0-9]+ split,
    # empties dropped), whole-token membership via DuckDB list lambdas
    sql["badwords_filter"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS tk
  FROM documents
),
h AS (
  SELECT doc_id,
         list_filter(tk, t -> list_contains(['slow', 'dup', 'stale'], t)) AS hits
  FROM toks
)
SELECT doc_id,
       CAST(len(hits) AS BIGINT) AS n_bad,
       CAST(len(list_distinct(hits)) AS BIGINT) AS bad_distinct,
       len(hits) = 0 AS keep
FROM h
"""

    _split_hex = "md5('42:' || source)"
    _split_val = "(" + " + ".join(
        f"CAST({_hexval_sql(f'substr({_split_hex}, {i + 1}, 1)')} AS BIGINT) * {16 ** (7 - i)}"
        for i in range(8)
    ) + ")"
    sql["split_corpus"] = f"""
SELECT doc_id, source,
       CASE WHEN ({_split_val} % 1000000) < 250000 THEN 'val' ELSE 'train' END AS split
FROM documents
"""

    # duplicated-8-gram coverage: a token survives iff no repeated window
    # covers it; DuckDB formulation via UNNEST(range) + lambda list_filter
    # (captures the outer token index) instead of Spark's exists() fold
    sql["dedup_substrings"] = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(words[i+1:i+8], ' ')) AS gh
  FROM w, UNNEST(range(0, greatest(len(words) - 7, 0))) AS t(i)
),
dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
cov AS (
  SELECT g.doc_id, list_sort(list(DISTINCT g.pos)) AS ps
  FROM g JOIN dup USING (gh) GROUP BY g.doc_id
),
tok AS (
  SELECT w.doc_id, t.i, w.words[t.i+1] AS word,
         coalesce(c.ps, CAST([] AS BIGINT[])) AS ps
  FROM w LEFT JOIN cov c USING (doc_id), UNNEST(range(0, len(w.words))) AS t(i)
),
kept AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text_dedup,
         count(*) AS n_kept
  FROM tok
  WHERE len(list_filter(ps, p -> p <= i AND i < p + 8)) = 0
  GROUP BY doc_id
)
SELECT w.doc_id,
       coalesce(k.text_dedup, '') AS text_dedup,
       CAST(len(w.words) AS BIGINT) AS n_tokens,
       CAST(len(w.words) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
FROM w LEFT JOIN kept k USING (doc_id)
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

    sql["quality_gopher"] = r"""
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

    # int8 quantization: identical IEEE double ops (mul/div/floor) in both
    # engines -> hash-exact, no approximation involved
    _QUANT_CTE = """
base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
m AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS mx
  FROM base
),
qz AS (
  SELECT vec_id, mx / 127.0 AS scale,
         CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v,
                     x -> CAST(floor(x * 127.0 / mx + 0.5) AS INTEGER))
         END AS qvec
  FROM m
)
"""

    sql["embedding_quantize"] = f"""
WITH {_QUANT_CTE}
SELECT vec_id, scale,
       md5(array_to_string(
             list_transform(qvec, x -> CAST(x AS VARCHAR)), ',')) AS q_md5,
       CAST(list_sum(list_transform(qvec, x -> CAST(x AS BIGINT) * x))
            AS BIGINT) AS qnorm
FROM qz
"""

    sql["ann_quantized"] = f"""
WITH {_QUANT_CTE},
n AS (
  SELECT vec_id AS id, qvec,
         CAST(list_sum(list_transform(qvec, x -> CAST(x AS BIGINT) * x))
              AS BIGINT) AS n2
  FROM qz
),
q AS (
  SELECT id AS qid, qvec AS qv, n2 AS qn2 FROM n WHERE id IN (0, 1, 2, 3, 4)
),
sims AS (
  SELECT q.qid AS query_id, n.id AS neighbor_id,
         CASE WHEN q.qn2 = 0 OR n.n2 = 0 THEN 0.0
              ELSE round(list_dot_product(q.qv, n.qvec)
                         / sqrt(CAST(q.qn2 AS DOUBLE) * CAST(n.n2 AS DOUBLE)), 6)
         END AS cosine_q
  FROM n CROSS JOIN q WHERE n.id <> q.qid
)
SELECT query_id, neighbor_id, rank, cosine_q FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_q DESC, neighbor_id) AS rank
  FROM sims
) WHERE rank <= 5
"""

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

    # image_near_dup: the planted two-level grid makes the aHash bit set =
    # the high-position set (see q_image_near_dup), so the oracle derives
    # each fingerprint as lo/hi 32-bit halves by pure arithmetic and
    # recomputes the pair set BRUTE-FORCE — proving the Spark side's
    # block-combination recall exact on a perceptual-hash fingerprint.
    _ahash_cond = "((g * 2654435761 + j * 40503) % 64 < 21) OR (j = doc_id % 5)"
    sql["image_near_dup"] = f"""
WITH bits AS (
  SELECT doc_id,
    CAST(list_sum([CASE WHEN {_ahash_cond} THEN (CAST(1 AS BIGINT) << j) ELSE 0 END
                   FOR j IN range(0, 32)]) AS BIGINT) AS lo,
    CAST(list_sum([CASE WHEN {_ahash_cond} THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END
                   FOR j IN range(32, 64)]) AS BIGINT) AS hi
  FROM (SELECT doc_id, CAST(doc_id // 5 AS BIGINT) AS g FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INTEGER) AS hamming
FROM bits a JOIN bits b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
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

    sql["bpe_encode"] = _bpe_encode_sql()
    sql["bpe_token_ids"] = _bpe_encode_sql(tail=_BPE_IDS_TAIL)

    # Shared by the semantic_dedup and ann_ivf oracles: seeds = n lowest
    # ids, ONE deterministic Lloyd update — round-0 argmax assignment, then
    # per-dimension DECIMAL-exact means (same double as Spark's
    # decimal-sum/count), empty clusters keep their seed vector. Mirrors
    # datapipe/similarity.py::lloyd_centroids exactly.
    _lloyd = """
c0 AS (SELECT id AS cid, v AS cv, nm AS cn FROM n ORDER BY id LIMIT 16),
a0 AS (
  SELECT n.id, n.v, c0.cid,
         row_number() OVER (
           PARTITION BY n.id
           ORDER BY round(list_dot_product(n.v, c0.cv) / (n.nm * c0.cn), 6) DESC, c0.cid
         ) AS r
  FROM n CROSS JOIN c0
),
cl0 AS (SELECT id, v, cid AS cluster FROM a0 WHERE r = 1),
lex AS (
  SELECT cluster, unnest(v) AS val, unnest(range(1, len(v)+1)) AS pos FROM cl0
),
lmm AS (
  SELECT cluster, pos,
         CAST(sum(CAST(val AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS mval
  FROM lex GROUP BY cluster, pos
),
lmv AS (SELECT cluster, list(mval ORDER BY pos) AS mv FROM lmm GROUP BY cluster),
c AS (
  SELECT c0.cid, coalesce(lmv.mv, c0.cv) AS cv,
         sqrt(list_dot_product(coalesce(lmv.mv, c0.cv), coalesce(lmv.mv, c0.cv))) AS cn
  FROM c0 LEFT JOIN lmv ON lmv.cluster = c0.cid
)"""

    # SemDeDup oracle: same deterministic Lloyd-refined centroids, same
    # argmax-cosine cluster assignment (tie -> lowest centroid id), same
    # within-cluster lowest-id-survives pruning at rounded cosine >= 0.35
    sql["semantic_dedup"] = f"""
WITH n AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nm
  FROM embeddings
),
{_lloyd},
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

    # outlier gate: the cells CTE of the semantic_dedup oracle, thresholded
    sql["embedding_outliers"] = f"""
WITH n AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nm
  FROM embeddings
),
{_lloyd},
asg AS (
  SELECT n.id, c.cid,
         round(list_dot_product(n.v, c.cv) / (n.nm * c.cn), 6) AS cs,
         row_number() OVER (
           PARTITION BY n.id
           ORDER BY round(list_dot_product(n.v, c.cv) / (n.nm * c.cn), 6) DESC, c.cid
         ) AS r
  FROM n CROSS JOIN c
)
SELECT id AS vec_id, cid AS cluster, cs AS cos_centroid, (cs >= 0.2) AS keep
FROM asg WHERE r = 1
"""

    # IVF-flat oracle: same deterministic centroids (16 lowest vec_ids), same
    # argmax-cosine cell assignment (tie -> lowest centroid id), same
    # 4-probe search, same (cosine desc, id) top-5
    sql["ann_ivf"] = f"""
WITH n AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nm
  FROM embeddings
),
{_lloyd},
sims AS (
  SELECT n.id, n.v, n.nm, c.cid,
         round(list_dot_product(n.v, c.cv) / (n.nm * c.cn), 6) AS cs,
         row_number() OVER (PARTITION BY n.id ORDER BY round(list_dot_product(n.v, c.cv) / (n.nm * c.cn), 6) DESC, c.cid ASC) AS r
  FROM n CROSS JOIN c
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

    sql["ann_lsh"] = _ann_lsh_sql()

    # pages_pipeline, demo_logs_roundtrip: intentionally no oracle
    # (generated input) -> driver records rows-only checks.
    # frame_sample + multimodal_features flipped to full oracles in r5:
    # the stub fingerprints are md5-based (the repo hash convention);
    # python range(0, max(dur,1), 1000) == DuckDB range() (both
    # end-exclusive), byte length via octet_length, and the ASCII-
    # sanitized feature payload makes DuckDB's VARCHAR md5 byte-
    # identical to python's md5 over the utf-8 payload.
    sql["multimodal_features"] = """
WITH d AS (
  SELECT doc_id,
         md5(substring(regexp_replace(text, '[^ -~]', '', 'g'), 1, 64)) AS h
  FROM documents
)
SELECT doc_id, 16 AS dims,
       round(list_sum(list_transform(range(0, 16), i ->
         CAST((strpos('0123456789abcdef', substring(h, 2*i+1, 1)) - 1) * 16
              + strpos('0123456789abcdef', substring(h, 2*i+2, 1)) - 1
              AS DOUBLE) / 127.5 - 1.0)), 4) AS feat_sum
FROM d
"""
    sql["frame_sample"] = """
WITH d AS (
  SELECT doc_id, encode(text) AS b,
         octet_length(encode(text)) % 90000 AS dur
  FROM documents
), f AS (
  SELECT doc_id, b,
         unnest(range(0, greatest(dur, 1), 1000)) AS off
  FROM d
)
SELECT doc_id,
       CAST(off // 1000 AS INTEGER) AS frame_idx,
       CAST(off AS INTEGER) AS offset_ms,
       md5(substring(lower(hex(b)), 1, 64) || '|' || CAST(off AS VARCHAR))
         AS frame_sha
FROM f
"""

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

    # Kneser-Ney bigram oracle: same pairs (with <s> sentinel via the
    # parallel-unnest zip idiom), same four vocabulary-bounded model
    # tables, the identical fixed expression tree over integer counts and
    # the binary-exact 0.75 discount, 6-dp log10 terms, DECIMAL sums.
    sql["kn_perplexity"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
  FROM documents
),
pairs AS (
  SELECT doc_id,
         CASE WHEN i = 1 THEN '<s>' ELSE ws[i - 1] END AS prev,
         w
  FROM (
    SELECT doc_id, ws,
           unnest(ws) AS w,
           unnest(generate_series(1, len(ws))) AS i
    FROM toks
  )
),
lm AS (SELECT prev, w, count(*) AS cnt FROM pairs GROUP BY 1, 2),
ctx AS (
  SELECT prev, CAST(sum(cnt) AS BIGINT) AS cp, CAST(count(*) AS BIGINT) AS nr
  FROM lm GROUP BY 1
),
cont AS (SELECT w, CAST(count(*) AS BIGINT) AS nl FROM lm GROUP BY 1),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS b, CAST(count(DISTINCT w) AS BIGINT) AS v
  FROM lm
),
terms AS (
  SELECT p.doc_id,
         CAST(round(log10(
           CASE WHEN c.cp IS NOT NULL THEN
             greatest(CAST(coalesce(l.cnt, 0) AS DOUBLE) - 0.75, 0.0)
               / CAST(c.cp AS DOUBLE)
             + 0.75 * CAST(c.nr AS DOUBLE) / CAST(c.cp AS DOUBLE)
               * (CAST(coalesce(k.nl, 0) + 1 AS DOUBLE)
                  / CAST(t.b + t.v AS DOUBLE))
           ELSE CAST(coalesce(k.nl, 0) + 1 AS DOUBLE)
                / CAST(t.b + t.v AS DOUBLE)
           END), 6) AS DECIMAL(25,6)) AS term
  FROM pairs p
  LEFT JOIN lm l ON l.prev = p.prev AND l.w = p.w
  LEFT JOIN ctx c ON c.prev = p.prev
  LEFT JOIN cont k ON k.w = p.w, tot t
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
            WHEN sc.nll <= 1.4648 THEN 'head'
            WHEN sc.nll <= 1.4753 THEN 'middle'
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
    # the alpha*m^2*2^49 numerator must be the SAME Python double in both
    # engines (float multiplication is order-sensitive): computed here with
    # the exact expression hll_estimate uses, embedded via repr round-trip.
    # ONE generator emits all three HLL oracles (total / per-group /
    # per-window) so the lockstep-critical constants (p=12 -> 4096 buckets,
    # 49-bit rank scale, 2.5m linear-counting threshold, the alpha
    # numerator) live in exactly one place next to freq.py's.
    sql["hll_distinct"] = _hll_est_sql(
        "SELECT event_type || '#' || CAST(user_id AS VARCHAR) AS v"
        " FROM events")
    sql["hll_grouped"] = _hll_est_sql(
        "SELECT event_type, CAST(user_id AS VARCHAR) AS v FROM events",
        group="event_type")
    _six_h_us = 6 * 3600 * 1000000
    sql["hll_windowed"] = _hll_est_sql(
        f"SELECT (epoch_us(ts) // {_six_h_us}) * {_six_h_us}"
        " AS window_start_us, CAST(user_id AS VARCHAR) AS v FROM events",
        group="window_start_us")

    sql["freq_sketch"] = """
WITH vals AS (
  SELECT event_type || '#' || CAST(user_id % 50 AS VARCHAR) AS v FROM events
),
ks AS (SELECT unnest(range(4)) AS i),
pos AS (
  SELECT v, i,
         ('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || v), 1, 15))::BIGINT
         % 2048 AS col_idx
  FROM vals, ks
),
cells AS (SELECT i AS row, col_idx, count(*) AS cnt FROM pos GROUP BY 1, 2),
dv AS (SELECT DISTINCT v FROM vals),
probe AS (
  SELECT v, i AS row,
         ('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || v), 1, 15))::BIGINT
         % 2048 AS col_idx
  FROM dv, ks
),
est AS (
  SELECT v, min(coalesce(cnt, 0)) AS est_count
  FROM probe LEFT JOIN cells USING (row, col_idx) GROUP BY v
),
ex AS (SELECT v, count(*) AS exact_count FROM vals GROUP BY v)
SELECT v AS value, est_count, exact_count FROM est JOIN ex USING (v)
"""

    sql["heavy_hitters"] = """
WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type),
t AS (SELECT count(*) AS n FROM events)
SELECT event_type, cnt, round(cnt / n, 6) AS share
FROM c, t WHERE cnt >= n * 0.05
"""

    sql["dedup_bloom"] = """
WITH ks AS (SELECT unnest(range(5)) AS i),
cpos AS (
  SELECT ('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || text), 1, 15))::BIGINT
         % 1048576 AS pos
  FROM documents, ks WHERE doc_id % 5 <> 0
),
filt AS (
  SELECT pos // 63 AS word_idx,
         bit_or(1::BIGINT << CAST(pos % 63 AS INTEGER)) AS word_bits
  FROM cpos GROUP BY 1
),
probe AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || text), 1, 15))::BIGINT
         % 1048576 AS pos
  FROM documents, ks WHERE doc_id % 5 = 0
),
pm AS (
  SELECT doc_id, pos // 63 AS word_idx,
         1::BIGINT << CAST(pos % 63 AS INTEGER) AS mask
  FROM probe
)
SELECT doc_id,
       bool_and(word_bits IS NOT NULL AND (word_bits & mask) = mask) AS maybe_dup
FROM pm LEFT JOIN filt USING (word_idx)
GROUP BY doc_id
"""

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

    # robots_discovery: expected directive rows from the same md5(host)
    # arithmetic; the bot group's delay must never appear
    _hu = _md5_u32("host")
    sql["robots_discovery"] = f"""
WITH h AS (SELECT DISTINCT source AS host FROM documents),
x AS (SELECT host, {_hu} AS hu FROM h),
dl AS (
  SELECT host,
         CAST(CASE
           WHEN hu % 5 = 0 THEN greatest(coalesce(
             CASE WHEN hu % 4 = 0 THEN 2.5 WHEN hu % 4 = 1 THEN 3.0 END, 10.0), 10.0)
           ELSE CASE WHEN hu % 4 = 0 THEN 2.5 WHEN hu % 4 = 1 THEN 3.0 END
         END AS DOUBLE) AS crawl_delay
  FROM x
),
sm AS (
  SELECT host, 'https://' || host || '/sm-' || CAST(hu % 7 AS VARCHAR) || '.xml' AS sitemap_url
  FROM x
  UNION ALL
  SELECT host, 'https://' || host || '/sm-extra.xml' FROM x
)
SELECT sm.host, sm.sitemap_url, dl.crawl_delay
FROM sm JOIN dl ON dl.host = sm.host
"""

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

    # extract_links / link_pagerank: the oracle rebuilds the expected link
    # rows directly from the fixture arithmetic (_planted_link_pages) —
    # ground truth by construction, no regex — so the Spark side's anchor
    # extraction, href resolution, and URL normalization are what is tested.
    _link_parts = """
p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN 'http' ELSE 'https' END AS scheme,
         CASE WHEN doc_id % 5 = 0
              THEN 'www.site' || CAST((doc_id // 7) % 23 AS VARCHAR) || '.co.uk'
              ELSE 'site' || CAST((doc_id // 7) % 23 AS VARCHAR) || '.com' END AS host,
         CASE WHEN doc_id % 5 = 0
              THEN 'site' || CAST((doc_id // 7) % 23 AS VARCHAR) || '.co.uk'
              ELSE 'site' || CAST((doc_id // 7) % 23 AS VARCHAR) || '.com' END AS dom,
         'ext' || CAST((doc_id // 3) % 11 AS VARCHAR) || '.org' AS exthost,
         'cdn' || CAST(doc_id % 5 AS VARCHAR) || '.net' AS cdnhost
  FROM documents
)"""
    sql["extract_links"] = f"""
WITH {_link_parts}
SELECT doc_id, 0 AS link_pos, host AS src_host,
       'https://' || exthost || '/a/' || CAST(doc_id % 97 AS VARCHAR) || '?a=1&z=9' AS dst_url,
       exthost AS dst_host, exthost AS dst_domain,
       'Ref ' || CAST(doc_id AS VARCHAR) AS anchor, FALSE AS is_internal
FROM p
UNION ALL
SELECT doc_id, 1, host,
       scheme || '://' || host || '/p/' || CAST(doc_id % 9 AS VARCHAR),
       host, dom, 'sec ' || CAST(doc_id % 3 AS VARCHAR), TRUE FROM p
UNION ALL
SELECT doc_id, 3, host,
       scheme || '://' || host || '/d/' || CAST(doc_id AS VARCHAR)
         || '/rel' || CAST(doc_id % 4 AS VARCHAR) || '.html',
       host, dom, 'Rel ' || CAST(doc_id % 5 AS VARCHAR), TRUE FROM p
UNION ALL
SELECT doc_id, 4, host,
       scheme || '://' || cdnhost || '/l.js',
       cdnhost, cdnhost, 'cdn', FALSE FROM p
"""

    _lpr_iter = """
{out} AS (
  SELECT nodes.host,
         CAST(15 * (1000000000000 // (SELECT n FROM nn)) // 100
              + 85 * coalesce(f.s, 0) // 100 AS BIGINT) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS host, sum({prev}.r // deg.d) AS s
    FROM e JOIN {prev} ON {prev}.host = e.src JOIN deg ON deg.src = e.src
    GROUP BY e.dst
  ) f ON f.host = nodes.host
)"""
    sql["link_pagerank"] = (
        f"""
WITH {_link_parts},
e AS (
  SELECT host AS src, exthost AS dst FROM p
  UNION ALL SELECT host, host FROM p
  UNION ALL SELECT host, host FROM p
  UNION ALL SELECT host, cdnhost FROM p
),
nodes AS (SELECT DISTINCT host
          FROM (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT host, CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS r
       FROM nodes),"""
        + ",".join(
            _lpr_iter.format(out=f"li{k}", prev=f"li{k - 1}" if k > 1 else "r0")
            for k in (1, 2, 3)
        )
        + "\nSELECT host, r AS pagerank FROM li3\n"
    )

    # sitemap_parse: entry rows rebuilt from the fixture arithmetic;
    # lastmod via DuckDB strptime (an independent datetime parser from
    # Spark's try_to_timestamp — both must land on the same epoch-us)
    sql["sitemap_parse"] = """
WITH d AS (
  SELECT doc_id, 'site' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS host
  FROM documents
)
SELECT doc_id, host, 0 AS entry_pos, 'url' AS kind,
       'https://' || host || '/p/' || CAST(doc_id % 9 AS VARCHAR) AS loc,
       epoch_us(strptime('2024-03-0' || CAST(1 + doc_id % 9 AS VARCHAR)
                         || 'T1' || CAST(doc_id % 10 AS VARCHAR) || ':30:00Z',
                         '%Y-%m-%dT%H:%M:%SZ')) AS lastmod_us,
       (['daily', 'weekly', 'monthly'])[CAST(doc_id % 3 AS INTEGER) + 1] AS changefreq,
       CAST('0.' || CAST(doc_id % 10 AS VARCHAR) AS DOUBLE) AS priority
FROM d WHERE doc_id % 5 <> 0
UNION ALL
SELECT doc_id, host, 1, 'url',
       'https://' || host || '/a/' || CAST(doc_id % 97 AS VARCHAR),
       epoch_us(strptime('2024-02-' || CAST(10 + doc_id % 18 AS VARCHAR), '%Y-%m-%d')),
       NULL, NULL
FROM d WHERE doc_id % 5 <> 0
UNION ALL
SELECT doc_id, host, 2, 'url', 'https://' || host || '/static/about',
       NULL, NULL, NULL
FROM d WHERE doc_id % 5 <> 0
UNION ALL
SELECT doc_id, host, 0, 'sitemap',
       'https://' || host || '/sitemap-' || CAST(doc_id % 7 AS VARCHAR) || '.xml',
       epoch_us(strptime('2024-01-2' || CAST(doc_id % 8 AS VARCHAR)
                         || 'T09:0' || CAST(doc_id % 6 AS VARCHAR) || ':00Z',
                         '%Y-%m-%dT%H:%M:%SZ')),
       NULL, NULL
FROM d WHERE doc_id % 5 = 0
UNION ALL
SELECT doc_id, host, 1, 'sitemap',
       'https://' || host || '/sitemap-news.xml', NULL, NULL, NULL
FROM d WHERE doc_id % 5 = 0
"""

    # link_hits: identical by-construction edge multiset, two unrolled
    # integer HITS half-rounds (L1 floor normalization — see datapipe.graph.hits)
    _hits_round = """
rh{k} AS (
  SELECT nodes.host,
         CAST(coalesce(f.s, 0) AS BIGINT) AS v
  FROM nodes LEFT JOIN (
    SELECT e.src AS host, sum({prev}.v) AS s
    FROM e JOIN {prev} ON {prev}.host = e.dst GROUP BY e.src
  ) f ON f.host = nodes.host
),
h{k} AS (
  SELECT host, CAST(v * 1000000 // (SELECT greatest(sum(v), 1) FROM rh{k}) AS BIGINT) AS v
  FROM rh{k}
),
ra{k} AS (
  SELECT nodes.host,
         CAST(coalesce(f.s, 0) AS BIGINT) AS v
  FROM nodes LEFT JOIN (
    SELECT e.dst AS host, sum(h{k}.v) AS s
    FROM e JOIN h{k} ON h{k}.host = e.src GROUP BY e.dst
  ) f ON f.host = nodes.host
),
a{k} AS (
  SELECT host, CAST(v * 1000000 // (SELECT greatest(sum(v), 1) FROM ra{k}) AS BIGINT) AS v
  FROM ra{k}
)"""
    sql["link_hits"] = (
        f"""
WITH {_link_parts},
e AS (
  SELECT host AS src, exthost AS dst FROM p
  UNION ALL SELECT host, host FROM p
  UNION ALL SELECT host, host FROM p
  UNION ALL SELECT host, cdnhost FROM p
),
nodes AS (SELECT DISTINCT host
          FROM (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT count(*) AS n FROM nodes),
a0 AS (SELECT host, CAST(1000000 // (SELECT n FROM nn) AS BIGINT) AS v FROM nodes),"""
        + ",".join(
            _hits_round.format(k=k, prev=f"a{k - 1}")
            for k in (1, 2)
        )
        + "\nSELECT h2.host, h2.v AS hub, a2.v AS authority FROM h2 JOIN a2 USING (host)\n"
    )

    # anchor_texts: aggregate the by-construction (dst_host, anchor) rows;
    # DuckDB's ordered-list idiom vs Spark's struct-sort fold for the top-k.
    sql["anchor_texts"] = f"""
WITH {_link_parts},
la AS (
  SELECT exthost AS dst_host, 'Ref ' || CAST(doc_id AS VARCHAR) AS anchor FROM p
  UNION ALL SELECT host, 'sec ' || CAST(doc_id % 3 AS VARCHAR) FROM p
  UNION ALL SELECT host, 'Rel ' || CAST(doc_id % 5 AS VARCHAR) FROM p
  UNION ALL SELECT cdnhost, 'cdn' FROM p
),
pc AS (SELECT dst_host, anchor, count(*) AS n FROM la GROUP BY 1, 2)
SELECT dst_host, CAST(sum(n) AS BIGINT) AS n_links,
       count(*) AS n_anchors,
       array_to_string(list(anchor ORDER BY n DESC, anchor)[1:3], '|') AS top_anchors
FROM pc GROUP BY 1
"""

    # crawl_frontier: rebuild the (dst_url, dst_host, src_host) reference
    # rows and the crawled set (pages + their /p/ section urls) from the
    # fixture arithmetic; NOT IN anti-join + QUALIFY per-host cap.
    sql["crawl_frontier"] = f"""
WITH {_link_parts},
lr AS (
  SELECT 'https://' || exthost || '/a/' || CAST(doc_id % 97 AS VARCHAR)
           || '?a=1&z=9' AS dst_url,
         exthost AS dst_host, host AS src_host FROM p
  UNION ALL
  SELECT scheme || '://' || host || '/p/' || CAST(doc_id % 9 AS VARCHAR),
         host, host FROM p
  UNION ALL
  SELECT scheme || '://' || host || '/d/' || CAST(doc_id AS VARCHAR)
           || '/rel' || CAST(doc_id % 4 AS VARCHAR) || '.html',
         host, host FROM p
  UNION ALL
  SELECT scheme || '://' || cdnhost || '/l.js', cdnhost, host FROM p
),
votes AS (SELECT dst_url, dst_host, src_host, count(*) AS n
          FROM lr GROUP BY 1, 2, 3),
cand AS (SELECT dst_url, dst_host, CAST(sum(n) AS BIGINT) AS n_refs,
                count(*) AS n_ref_hosts
         FROM votes GROUP BY 1, 2),
seen AS (
  SELECT scheme || '://' || host || '/d/' || CAST(doc_id AS VARCHAR)
           || '/index.html' AS u FROM p
  UNION
  SELECT scheme || '://' || host || '/p/' || CAST(doc_id % 9 AS VARCHAR) FROM p
)
SELECT dst_url, dst_host, n_refs, n_ref_hosts
FROM cand WHERE dst_url NOT IN (SELECT u FROM seen)
QUALIFY row_number() OVER (PARTITION BY dst_host
                           ORDER BY n_refs DESC, dst_url) <= 2
"""

    # harmonic_centrality: exact in-balls by unrolled joins over the
    # DISTINCT by-construction edges, sketched with the SAME md5 register
    # math as freq.hll_sketch (register-max merging is lossless, so
    # sketch(exact ball) == HyperBall's iterated state), then the same
    # integer shell arithmetic. Constants mirror _hll_est_sql at p=12.
    _hb_m = 1 << 12
    _hb_num = repr(0.7213 / (1 + 1.079 / _hb_m) * _hb_m * _hb_m * float(1 << 49))
    sql["harmonic_centrality"] = f"""
WITH {_link_parts},
e0 AS (
  SELECT host AS src, exthost AS dst FROM p
  UNION ALL SELECT host, host FROM p
  UNION ALL SELECT host, cdnhost FROM p
),
e AS (SELECT DISTINCT src, dst FROM e0),
nodes AS (SELECT DISTINCT host
          FROM (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),
b0 AS (SELECT host AS v, host AS m FROM nodes),
b1 AS (SELECT DISTINCT v, m FROM (
        SELECT e.dst AS v, b0.m FROM e JOIN b0 ON b0.v = e.src
        UNION ALL SELECT v, m FROM b0)),
b2 AS (SELECT DISTINCT v, m FROM (
        SELECT e.dst AS v, b1.m FROM e JOIN b1 ON b1.v = e.src
        UNION ALL SELECT v, m FROM b1)),
balls AS (
  SELECT 0 AS t, v, m FROM b0
  UNION ALL SELECT 1, v, m FROM b1
  UNION ALL SELECT 2, v, m FROM b2),
hs AS (SELECT t, v, ('0x' || substr(md5(m), 1, 15))::BIGINT AS h FROM balls),
regs AS (SELECT t, v, h % {_hb_m} AS bucket,
                max(CASE WHEN (h >> 12) > 0 THEN 49 - length(bin(h >> 12))
                         ELSE 49 END) AS max_rho
         FROM hs GROUP BY 1, 2, 3),
agg AS (SELECT t, v, sum(1::BIGINT << (49 - max_rho)) AS s_present,
               count(*) AS n_present
        FROM regs GROUP BY 1, 2),
est AS (SELECT t, v,
               {_hb_num} / CAST(s_present
                 + ({_hb_m} - n_present) * (1::BIGINT << 49) AS DOUBLE) AS raw,
               CAST({_hb_m} - n_present AS DOUBLE) AS zeros
        FROM agg),
micros AS (SELECT t, v,
                  CAST(round(round(CASE WHEN raw <= 2.5 * {_hb_m} AND zeros > 0
                             THEN {_hb_m}.0 * ln({_hb_m}.0 / zeros)
                             ELSE raw END, 4) * 10000) AS BIGINT) AS mm
           FROM est),
inc AS (SELECT v, t, mm - lag(mm) OVER (PARTITION BY v ORDER BY t) AS d
        FROM micros)
SELECT v AS host,
       CAST(sum(greatest(d, 0) * 1000000 // t) AS BIGINT) AS hc_micro
FROM inc WHERE t >= 1 GROUP BY 1
"""

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

    # temperature budgets recomputed in SQL: identical micro-unit-integer
    # weight contract as datapipe.corpus.temperature_budgets, then pure
    # integer division — cross-engine exact past the rounded-6 weight
    sql["mixture_temperature"] = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)
           AS n_tokens,
         md5('mix|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
g AS (
  SELECT lang, sum(n_tokens) AS n FROM t
  WHERE lang IS NOT NULL GROUP BY 1 HAVING sum(n_tokens) > 0
),
w AS (
  SELECT lang, CAST(round(exp(ln(CAST(n AS DOUBLE)) / 2.0) * 1000000) AS BIGINT) AS wt
  FROM g
),
tot AS (SELECT sum(wt) AS ws FROM w),
b AS (SELECT lang, CAST(4000 * wt AS BIGINT) // ws AS budget FROM w, tot),
c AS (
  SELECT t.doc_id, t.lang, t.n_tokens, b.budget,
         sum(t.n_tokens) OVER (
           PARTITION BY t.lang ORDER BY t.h, t.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM t JOIN b USING (lang)
)
SELECT doc_id, lang, n_tokens FROM c WHERE cum <= budget
"""

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
    sql["wet_extract"] = _wet_sql()
    sql["boilerplate_blocks"] = _boilerplate_sql()

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

    # independent formulation of the broadcast-fold argmax: cross join +
    # row_number, same rounded-6 cosine and lowest-bench-id tie-break
    sql["decontaminate_semantic"] = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nm
  FROM embeddings
),
c AS (SELECT * FROM base WHERE vec_id % 97 <> 3),
b AS (SELECT * FROM base WHERE vec_id % 97 = 3),
scored AS (
  SELECT c.vec_id, b.vec_id AS bench_id,
         round(list_dot_product(c.v, b.v) / (c.nm * b.nm), 6) AS cs,
         row_number() OVER (
           PARTITION BY c.vec_id
           ORDER BY round(list_dot_product(c.v, b.v) / (c.nm * b.nm), 6) DESC,
                    b.vec_id
         ) AS rn
  FROM c, b
)
SELECT vec_id, bench_id, cs AS max_cos, cs < 0.3 AS keep
FROM scored WHERE rn = 1
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
    def _pack_sql(source: str = "documents", n_expr: str | None = None) -> str:
        n_expr = n_expr or "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) + 1"
        return f"""
WITH t AS (
  SELECT doc_id, {_shard_val} % 8 AS shard, {_shard_hex} AS h,
         CAST({n_expr} AS BIGINT) AS n
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

    # token-exact packing: the BPE recursive encoder's counts drive the
    # identical packing arithmetic (+1 = the eos slot)
    sql["pack_sequences_bpe"] = _pack_sql(
        source=f"(SELECT d.doc_id, b.n_tokens AS n_bpe FROM documents d "
        f"JOIN ({_bpe_encode_sql()}) b USING (doc_id)) bsrc",
        n_expr="n_bpe + 1",
    )

    # the round-4 composed dataset build: substring-dedup text -> source-
    # disjoint split (train side) -> recursive-CTE BPE counts over the
    # DEDUPED text -> the shared packing arithmetic. Stages chained as
    # CTEs; the pack SQL's own WITH is spliced into the chain.
    _dsb_pack = _pack_sql(
        source="(SELECT t2.doc_id, e.n_tokens AS n_bpe FROM tr t2 "
        "JOIN enc e USING (doc_id)) ps",
        n_expr="n_bpe + 1",
    ).strip()
    assert _dsb_pack.startswith("WITH ")
    sql["dataset_build"] = f"""
WITH dd AS ({sql["dedup_substrings"]}),
tr AS (
  SELECT dd.doc_id, dd.text_dedup AS text
  FROM dd JOIN documents d USING (doc_id)
  WHERE ({_split_val} % 1000000) >= 250000
),
enc AS (SELECT * FROM ({_bpe_encode_sql(doc_source="tr")}) e),
{_dsb_pack[5:]}
"""

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


QUERIES = {
    "pages_routed": q_pages_routed,
    "pages_sink_counts": q_pages_sink_counts,
    "pages_domain_rollup": q_pages_domain_rollup,
    "pages_fused_sinks": q_pages_fused_sinks,
    "ann_ivf": q_ann_ivf,
    "ann_lsh": q_ann_lsh,
    "boilerplate_blocks": q_boilerplate_blocks,
    "bpe_encode": q_bpe_encode,
    "bpe_pair_counts": q_bpe_pair_counts,
    "bpe_token_ids": q_bpe_token_ids,
    "pack_sequences_bpe": q_pack_sequences_bpe,
    "chunk_documents": q_chunk_documents,
    "corpus_build": q_corpus_build,
    "corpus_stats": q_corpus_stats,
    "cosine_topk": q_cosine_topk,
    "embedding_quantize": q_embedding_quantize,
    "ann_quantized": q_ann_quantized,
    "crawl_pipeline": q_crawl_pipeline,
    "curation_pipeline": q_curation_pipeline,
    "decontaminate": q_decontaminate,
    "decontaminate_semantic": q_decontaminate_semantic,
    "mixture_temperature": q_mixture_temperature,
    "dedup_clusters": q_dedup_clusters,
    "dedup_exact_text": q_dedup_exact_text,
    "dedup_ladder": q_dedup_ladder,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_hamming": q_dedup_simhash_hamming,
    "dedup_spans": q_dedup_spans,
    "dedup_substrings": q_dedup_substrings,
    "c4_line_filter": q_c4_line_filter,
    "wet_extract": q_wet_extract,
    "badwords_filter": q_badwords_filter,
    "split_corpus": q_split_corpus,
    "dataset_build": q_dataset_build,
    "doc_fingerprint": q_doc_fingerprint,
    "dsir_resample": q_dsir_resample,
    "embedding_near_dup": q_embedding_near_dup,
    "frame_sample": q_frame_sample,
    "html_text": q_html_text,
    "dedup_bloom": q_dedup_bloom,
    "freq_sketch": q_freq_sketch,
    "heavy_hitters": q_heavy_hitters,
    "hll_distinct": q_hll_distinct,
    "hll_grouped": q_hll_grouped,
    "hll_windowed": q_hll_windowed,
    "incremental_dedup": q_incremental_dedup,
    "langid": q_langid,
    "mixture_sample": q_mixture_sample,
    "multimodal_features": q_multimodal_features,
    "multimodal_meta": q_multimodal_meta,
    "image_near_dup": q_image_near_dup,
    "normalize_text": q_normalize_text,
    "pack_sequences": q_pack_sequences,
    "pagerank": q_pagerank,
    "extract_links": q_extract_links,
    "link_pagerank": q_link_pagerank,
    "link_hits": q_link_hits,
    "sitemap_parse": q_sitemap_parse,
    "anchor_texts": q_anchor_texts,
    "crawl_frontier": q_crawl_frontier,
    "harmonic_centrality": q_harmonic_centrality,
    "pages_pipeline": q_pages_pipeline,
    "perplexity_bucket": q_perplexity_bucket,
    "kn_perplexity": q_kn_perplexity,
    "pii_scrub": q_pii_scrub,
    "quality_classifier": q_quality_classifier,
    "quality_gopher": q_quality_gopher,
    "quality_repetition": q_quality_repetition,
    "robots_filter": q_robots_filter,
    "robots_discovery": q_robots_discovery,
    "sample_stratified": q_sample_stratified,
    "semantic_dedup": q_semantic_dedup,
    "embedding_outliers": q_embedding_outliers,
    "shuffle_corpus": q_shuffle_corpus,
    "text_quality": q_text_quality,
    "tfidf_keywords": q_tfidf_keywords,
    "token_count": q_token_count,
    "url_filter": q_url_filter,
}
