"""Training-data ops: dedup tiers, similarity search, text analysis,
multimodal plumbing."""

import hashlib
import math

from pyspark.sql import functions as F

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

from conftest import rows


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
            (2, "the quick brown fox jumps over the lazy cat today"),    # near dup
            (3, "completely different content about spark pipelines"),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark))
    got = {r.keep_id: r.dup_count for r in out.collect()}
    assert got[0] == 2  # docs 0 and 1 collapse, min id kept
    assert got[2] == 1 and got[3] == 1


def test_minhash_identical_docs_jaccard_one(spark):
    out = rows(minhash_lsh_pairs(_docs(spark), threshold=0.5), "doc_a", "doc_b", "jaccard")
    assert (0, 1, 1.0) in out
    # near-dup pair 0-2 shares most shingles; disjoint doc 3 pairs with nothing
    assert all(a != 3 and b != 3 for a, b, _ in out)


def test_ngram_jaccard_methods_agree_and_exact_value(spark):
    """counts / prefix / brute produce IDENTICAL pairs, and the jaccard
    value matches a hand computation on the trigram sets."""
    from vector_spark.datapipe import ngram_jaccard_pairs

    df = _docs(spark)
    got = {
        m: sorted(rows(ngram_jaccard_pairs(df, threshold=0.3, method=m),
                       "doc_a", "doc_b", "jaccard"))
        for m in ("counts", "prefix", "brute", "bitmap", "auto")
    }
    assert (
        got["counts"] == got["prefix"] == got["brute"]
        == got["bitmap"] == got["auto"]
    )

    # hand check: exact dup pair (0,1) has jaccard 1.0; python reference
    def tri(s):
        return {s[i:i + 3] for i in range(max(len(s) - 2, 1))}

    texts = {r.doc_id: r.text for r in df.collect()}
    expect = []
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ga, gb = tri(texts[a]), tri(texts[b])
            j = round(len(ga & gb) / len(ga | gb), 4)
            if j >= 0.3:
                expect.append((a, b, j))
    assert got["counts"] == sorted(expect)
    assert (0, 1, 1.0) in got["counts"]


def test_simhash_identical_equal_distinct_differs(spark):
    got = {r.doc_id: r.simhash for r in simhash(_docs(spark)).collect()}
    assert got[0] == got[1]
    assert got[0] != got[3]
    assert all(0 <= v < (1 << 16) for v in got.values())


def _brute_hamming_pairs(fps: dict, d: int):
    ids = sorted(fps)
    return {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fps[a] ^ fps[b]).count("1") <= d
    }


def test_simhash_hamming_pairs_equals_brute_force(spark):
    from vector_spark.datapipe import simhash_hamming_pairs

    # 24 docs over a 6-word vocabulary: dense near-dup structure
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [
        (i, " ".join(vocab[j] for j in range(6) if (i >> j) % 2 or j < 2))
        for i in range(24)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {r.doc_id: r.simhash for r in simhash(df, bits=32).collect()}
    brute = _brute_hamming_pairs(fps, 3)
    got6 = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_hamming_pairs(df, max_hamming=3, bits=32, n_blocks=6).collect()
    }
    # pigeonhole recall theorem: banded join == brute force, exactly
    assert got6 == brute
    # degenerate single-block scheme (n_blocks = d+1) finds the same set
    got4 = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_hamming_pairs(df, max_hamming=3, bits=32, n_blocks=4).collect()
    }
    assert got4 == brute
    # a planted exact-duplicate pair must surface at hamming 0
    df2 = spark.createDataFrame(
        [(100, "same words here"), (101, "same words here")] + docs,
        "doc_id long, text string",
    )
    out = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs(df2, max_hamming=3, bits=32, n_blocks=6).collect()
    }
    assert out[(100, 101)] == 0


def test_text_quality_exact(spark):
    df = spark.createDataFrame([(1, "the cat and the hat")], "doc_id long, text string")
    r = text_quality(df).collect()[0]
    assert r["n_chars"] == 19
    assert r["n_words"] == 5
    assert r["n_distinct_words"] == 4
    assert r["stopword_ratio"] == round(3 / 5, 4)  # the, and, the
    assert r["distinct_ratio"] == 0.8
    assert r["avg_word_len"] == 3.0  # (19 - 4 spaces) / 5


def test_token_count_exact(spark):
    df = spark.createDataFrame([(1, "hello world, x12 done!")], "doc_id long, text string")
    r = token_count(df).collect()[0]
    assert r["ws_tokens"] == 4
    # hello | world | , | x | 1 | 2 | done | ! = 8
    assert r["bpe_tokens"] == 8


def test_doc_fingerprint_md5_and_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "Alpha Beta"), (2, "beta alpha")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.content_md5, r.rolling_hash) for r in doc_fingerprint(df).collect()}
    assert got[1][0] == hashlib.md5(b"alpha beta").hexdigest()
    assert got[1][1] != got[2][1]  # rolling hash is order-sensitive


def test_langid_trigram_profiles(spark):
    """Real-language sentences classify correctly via the char-trigram
    profiles; a too-short text scores 0.0 everywhere (lexicographic
    fallback)."""
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox is running to the end of the land"),
            (2, "Die Kinder sprechen und singen durch den schoenen Garten"),
            (3, "Le chat est une petite creature que nous aimons par la fenetre"),
            (4, "xq"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in langid(df).collect()}
    assert out[1]["predicted_lang"] == "en"
    assert out[2]["predicted_lang"] == "de"
    assert out[3]["predicted_lang"] == "fr"
    # too-short text: all scores 0.0, lexicographic fallback = first
    # sorted profile (ca since the 20-language set)
    assert out[4]["score_en"] == 0.0 and out[4]["predicted_lang"] == "ca"


def test_langid_twenty_languages(spark):
    """The broadened profile set classifies real sentences in all 20
    languages. The discriminative clusters the unique markers must
    separate: es-pt-ca (shared de/que/ent Romance core), da-no-sv
    (shared er/en/et/og/at Scandinavian core — af/med vs av/på/ikke vs
    och/är/att decide), cs-pl (Slavic Latin-script)."""
    sentences = [
        (1, "es", "la casa del perro es muy grande y el niño que vive en ella come con sus amigos"),
        (2, "pt", "a casa do menino é muito grande e o cão que vive em uma vila para todos começa"),
        (3, "it", "il gatto che vive nella casa della nonna è una creatura di grande bellezza"),
        (4, "nl", "de kinderen van het dorp lopen een uur door de mooie straten naar het grote huis"),
        (5, "sv", "barnen är glada och vill att det ska bli sommar för att de har en fin dag"),
        (6, "pl", "dzieci w wiosce nie chcą się uczyć przez cały dzień ale wiedzą że to jest ważne"),
        (7, "id", "anak anak di desa itu sedang belajar dengan senang untuk menjadi orang yang berguna"),
        (8, "en", "the children of the village are walking to the large house in the morning"),
        (9, "de", "die kinder aus dem dorf gehen durch die schönen strassen und singen ein lied"),
        (10, "fr", "les enfants du village marchent par la rue pour aller à une grande maison"),
        (11, "ro", "copiii din sat merg pe drum către casa cea mare și cântă de bucurie cu prietenii lor"),
        (12, "tr", "köydeki çocuklar bir güzel sabah ile büyük eve doğru yürüyorlar ve şarkı söylüyorlar"),
        (13, "cs", "děti ze vsi jdou po cestě k velkému domu a zpívají si že je to pěkný den"),
        (14, "da", "børnene fra landsbyen går med deres venner hen til det store hus af træ for at synge"),
        (15, "no", "barna fra landsbyen går på veien til det store huset og jeg vet at de ikke er triste"),
        (16, "fi", "lapset ovat talossa ja he laulavat koska kesällä on mukavaa olla järvessä uimassa"),
        (17, "hu", "a falu gyerekei reggel az úton sétálnak a nagy házhoz és énekelnek hogy egy szép nap van"),
        (18, "ca", "els nens del poble caminen per la ciutat cap a les cases grans i canten una cançó"),
        (19, "vi", "những đứa trẻ trong làng đang đi bộ đến ngôi nhà lớn và chúng hát một bài hát của mình"),
        (20, "ru", "дети из деревни идут по дороге к большому дому и поют песню о прекрасном дне"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, _, t in sentences], "doc_id long, text string"
    )
    got = {r.doc_id: r.predicted_lang for r in langid(df).collect()}
    for i, expect, _ in sentences:
        assert got[i] == expect, f"doc {i}: expected {expect}, got {got[i]}"


def test_langid_profiles_well_formed_and_subset_param(spark):
    """Every profile is exactly 24 distinct length-3 trigrams (the regex
    and the SQL oracle both assume this); `languages=` restricts scoring
    cost to the selected profiles and rejects unknown codes."""
    from vector_spark.datapipe.text import LANG_TRIGRAMS

    assert len(LANG_TRIGRAMS) == 20
    for lang, profile in LANG_TRIGRAMS.items():
        assert len(profile) == 24 and len(set(profile)) == 24, lang
        assert all(len(t) == 3 for t in profile), lang

    df = spark.createDataFrame(
        [(1, "the children of the village are walking to the large house")],
        "doc_id long, text string",
    )
    out = langid(df, languages=["en", "de"])
    assert out.columns == ["doc_id", "score_de", "score_en", "predicted_lang"]
    assert out.collect()[0].predicted_lang == "en"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown language"):
        langid(df, languages=["en", "xx"])


def _vecs(spark):
    rows_ = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # nearest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # farthest from 0
    ]
    return spark.createDataFrame(rows_, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering_and_self_exclusion(spark):
    out = cosine_topk(_vecs(spark), query_ids=[0], k=3)
    got = [(r.neighbor_id, r.rank, r.cosine) for r in out.orderBy("rank").collect()]
    assert [g[0] for g in got] == [1, 2, 3]
    assert got[0][2] > 0.99
    assert got[2][2] == -1.0
    assert all(g[0] != 0 for g in got)


def test_lsh_ann_subset_of_bruteforce_space(spark):
    out = lsh_ann_topk(_vecs(spark), query_ids=[0], k=3, dims=3, planes=2)
    for r in out.collect():
        assert r.query_id == 0 and r.neighbor_id != 0


def test_binary_meta_stub_plumbing(spark):
    df = spark.createDataFrame([(1, b"\x89PNG1234")], "doc_id long, payload binary")
    r = binary_meta(df).collect()[0]
    assert r["n_bytes"] == 8
    assert r["magic"] == b"\x89PNG".hex()
    assert r["fake_width"] == 64 + 8 % 577


def test_embedding_near_dup_banded_matches_bruteforce_on_found(spark):
    """Banded-LSH candidates are a subset of all-pairs; every emitted pair's
    cosine equals the brute-force value; identical vectors (cosine 1.0) are
    always found (they agree on every band)."""
    from vector_spark.datapipe import embedding_near_dup_pairs

    dims = 8
    rows_in = [
        (0, [1.0] * dims),
        (1, [1.0] * dims),                      # exact dup of 0
        (2, [1.0] * (dims - 1) + [0.9]),        # near dup
        (3, [(-1.0) ** i for i in range(dims)]),  # far away
    ]
    df = spark.createDataFrame(rows_in, "vec_id long, embedding array<double>")
    banded = embedding_near_dup_pairs(df, threshold=0.9, dims=dims)
    brute = embedding_near_dup_pairs(df, threshold=0.9, dims=dims, brute_force=True)
    got_b = {(r.id_a, r.id_b): r.cosine for r in banded.collect()}
    got_f = {(r.id_a, r.id_b): r.cosine for r in brute.collect()}
    assert set(got_b) <= set(got_f)
    assert (0, 1) in got_b and got_b[(0, 1)] == 1.0
    for k, v in got_b.items():
        assert got_f[k] == v


def test_embedding_near_dup_default_plan_has_no_nested_loop(spark):
    """The 100 TB guarantee: the default path is hash joins only."""
    from vector_spark.datapipe import embedding_near_dup_pairs

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    out = embedding_near_dup_pairs(df, threshold=0.9, dims=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_cluster_and_prune(spark):
    """SemDeDup semantics: docs cluster to the nearest deterministic
    centroid; within a cluster the lowest id of any >=threshold pair
    survives and every higher one prunes (even via different partners);
    sub-threshold cluster-mates keep. Plan: the only nested-loop join is
    the tiny broadcast centroid assignment — the pairwise step is a
    cluster-keyed equi-join, never a cartesian product."""
    from vector_spark.datapipe import semantic_dedup

    rows = [
        (0, [1.0, 0.0]),    # centroid A
        (1, [0.0, 1.0]),    # centroid B
        (2, [1.0, 0.05]),   # cluster A, near-dup of 0 -> pruned
        (3, [0.05, 1.0]),   # cluster B, near-dup of 1 -> pruned
        (4, [1.0, -0.9]),   # cluster A, cos to all mates < 0.9 -> kept
        (5, [1.0, 0.04]),   # cluster A, dup of 0 AND 2 -> pruned once
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # seed-centroid path pins the hand-computed clusters; the Lloyd-refined
    # default is covered by test_lloyd.py and the oracle
    out = semantic_dedup(df, threshold=0.9, n_centroids=2, lloyd_rounds=0)
    got = {r.vec_id: (r.cluster, r.keep) for r in out.collect()}
    assert got == {0: (0, True), 1: (1, True), 2: (0, False),
                   3: (1, False), 4: (0, True), 5: (0, False)}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # assignment is a narrow expression fold over the broadcast centroid
    # array — no per-id argmax window anywhere in the plan (the only _id
    # exchange left is the final keep-flag equi-join)
    assert "row_number" not in plan
    assert "Window" not in plan


def test_normalize_text_forms_and_dedup_effect(spark):
    """Composed and decomposed accents normalize to identical strings
    (so exact_dedup collapses them); NFKC additionally folds
    compatibility chars like the ligature fi; options compose."""
    from vector_spark.datapipe import exact_dedup, normalize_text

    docs = spark.createDataFrame(
        [(1, "café"), (2, "café"), (3, "ﬁne")],
        "doc_id long, text string",
    )
    nfc = {r.doc_id: r.text for r in normalize_text(docs, "NFC").collect()}
    assert nfc[1] == nfc[2] == "café"
    assert nfc[3] == "ﬁne"                      # NFC keeps the ligature
    nfkc = {r.doc_id: r.text for r in normalize_text(docs, "NFKC").collect()}
    assert nfkc[3] == "fine"                          # NFKC folds it

    dedup = exact_dedup(normalize_text(docs, "NFC"))
    assert {(r.keep_id, r.dup_count) for r in dedup.collect()} == {(1, 2), (3, 1)}

    ws = normalize_text(
        spark.createDataFrame([(1, "  A  b́  ")], "doc_id long, text string"),
        "NFC", lower=True, collapse_ws=True,
    ).collect()[0].text
    assert ws == "a b́"


def test_corpus_stats_rollup_levels(spark):
    """ROLLUP emits slice, lang-subtotal, and grand-total rows with
    hand-computed counts; dedup counts distinct texts; exactly one
    data exchange in the plan (grouping sets expand before it)."""
    from vector_spark.datapipe import corpus_stats

    docs = spark.createDataFrame(
        [(1, "en", "s1", "a b"), (2, "en", "s1", "a b"), (3, "en", "s2", "c"),
         (4, "de", "s1", "d e f")],
        "doc_id long, lang string, source string, text string",
    )
    out = corpus_stats(docs)
    got = {(r.lang, r.source): (r.docs, r.tokens, r.distinct_texts, r.avg_tokens)
           for r in out.collect()}
    assert got[("en", "s1")] == (2, 4, 1, 2.0)       # exact dup collapses
    assert got[("en", None)] == (3, 5, 2, round(5 / 3, 4))
    assert got[(None, None)] == (4, 8, 3, 2.0)

    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # the two-phase distinct aggregate may shuffle more than once, but
    # every exchange must be keyed by grouping cols / the md5 — dictionary
    # traffic, never text payloads
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = re.findall(r"(\w+)#", m.group(1))
        assert set(keys) <= {"lang", "source", "_h", "spark_grouping_id"}, m.group(0)


def test_incremental_dedup_tiers_and_delta_isolation(spark):
    """Exact tier catches identical text (lowest corpus id); near tier
    additionally catches a 3/4-shingle overlap (jaccard 0.6 >= 0.5);
    unrelated text is novel; identical twins WITHIN the delta are both
    novel (delta-vs-delta is the batch operator's job)."""
    from vector_spark.datapipe import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "totally different corpus words entirely")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(10, "a b c d e f"), (11, "a b c d e z"),
         (12, "nothing like anything else"), (13, "twin text"), (14, "twin text")],
        "doc_id long, text string",
    )
    exact = sorted(
        (r.doc_id, r.novel, r.dup_of)
        for r in incremental_dedup(delta, corpus, near=False).collect()
    )
    assert exact == [(10, False, 1), (11, True, None), (12, True, None),
                     (13, True, None), (14, True, None)]
    near = sorted(
        (r.doc_id, r.novel, r.dup_of)
        for r in incremental_dedup(delta, corpus, near=True, threshold=0.5).collect()
    )
    assert near == [(10, False, 1), (11, False, 1), (12, True, None),
                    (13, True, None), (14, True, None)]


def test_robots_sitemaps_and_crawl_delay(spark):
    """Sitemap lines are group-independent (one sits inside the bot group
    — it must still surface); Crawl-delay is group-scoped (the bot
    group's 1 must not leak into the '*' resolution), two applicable
    groups take the max, unparseable values drop, and a host with no
    applicable delay emits no row."""
    from vector_spark.datapipe import robots_crawl_delay, robots_sitemaps

    a = (
        "Sitemap: https://a.example/s1.xml\n"
        "User-agent: bot\nCrawl-delay: 1\nDisallow: /\n"
        "Sitemap: https://a.example/s2.xml\n"
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n"
        "User-agent: *\nCrawl-delay: 10\nDisallow: /y\n"
    )
    b = "User-agent: *\nCrawl-delay: nope\nDisallow: /z\n"
    df = spark.createDataFrame([("a", a), ("b", b)], "host string, robots_txt string")

    sm = {(r.host, r.sitemap_url) for r in robots_sitemaps(df).collect()}
    assert sm == {
        ("a", "https://a.example/s1.xml"),
        ("a", "https://a.example/s2.xml"),
    }
    dl = {r.host: r.crawl_delay for r in robots_crawl_delay(df, agent="*").collect()}
    assert dl == {"a": 10.0}


def test_robots_rules_and_longest_match(spark):
    """RFC 9309 semantics: consecutive User-agent lines share one group;
    only groups containing '*' apply; valueless Disallow and non-rule
    lines drop; admission is longest-match with allow winning ties and
    no-match defaulting to allowed."""
    from vector_spark.datapipe import parse_robots_rules, robots_filter

    content = (
        "User-agent: bot\nDisallow: /\n"
        "User-agent: *\nUser-agent: other\n"
        "Disallow: /private\nAllow: /private/ok\nDisallow:\nSitemap: /s\n"
    )
    robots = spark.createDataFrame(
        [("h1", content), ("h2", "User-agent: bot\nDisallow: /")],
        "host string, robots_txt string",
    )
    rules = parse_robots_rules(robots, agent="*")
    got = {(r.host, r.rule, r.allow) for r in rules.collect()}
    assert got == {("h1", "/private", False), ("h1", "/private/ok", True)}

    urls = spark.createDataFrame(
        [
            (1, "h1", "/private/ok/page"),   # allow rule is longer -> allowed
            (2, "h1", "/private/secret"),    # disallow matches -> blocked
            (3, "h1", "/public"),            # no rule matches -> allowed
            (4, "h2", "/anything"),          # no '*' group at all -> allowed
        ],
        "uid long, host string, path string",
    )
    out = {r.uid: r.allowed for r in robots_filter(urls, rules, url_col="uid").collect()}
    assert out == {1: True, 2: False, 3: True, 4: True}

    # RFC 9309 2.2.3 special chars: '*' spans, trailing '$' anchors
    wrules = spark.createDataFrame(
        [("h", "/*.pdf$", False), ("h", "/w*/x$", False)],
        "host string, rule string, allow boolean",
    )
    wurls = spark.createDataFrame(
        [(1, "h", "/docs/a.pdf"), (2, "h", "/docs/a.pdfx"),
         (3, "h", "/w123/x"), (4, "h", "/w123/xy")],
        "uid long, host string, path string",
    )
    wout = {r.uid: r.allowed for r in robots_filter(wurls, wrules, url_col="uid").collect()}
    assert wout == {1: False, 2: True, 3: False, 4: True}

    # url ids colliding across hosts keep one decision per (host, url)
    curls = spark.createDataFrame(
        [(1, "h1", "/private/zz"), (1, "h2", "/private/zz")],
        "uid long, host string, path string",
    )
    cout = sorted((r.host, r.allowed)
                  for r in robots_filter(curls, rules, url_col="uid").collect())
    assert cout == [("h1", False), ("h2", True)]

    # RFC 9309 2.2.1: an agent with no group of its own falls back to '*'
    fb = parse_robots_rules(robots, agent="mybot")
    got_fb = {(r.host, r.rule) for r in fb.collect()}
    # h1 falls back to its '*' group; h2 has neither mybot nor '*' -> none
    assert got_fb == {("h1", "/private"), ("h1", "/private/ok")}
    bot = parse_robots_rules(robots, agent="bot")
    assert {(r.host, r.rule) for r in bot.collect()} == {("h1", "/"), ("h2", "/")}


def test_tfidf_keywords_hand_computed(spark):
    """N=3 docs; 'rare' appears only in doc 1 (idf ln(4/2)), 'the' in all
    three (idf ln(4/4)=0 -> score 0 but still rankable); tf weights the
    repeated term; ties break on term text."""
    import math

    from vector_spark.datapipe import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "the rare rare word"), (2, "the word"), (3, "the word")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.score)
           for r in tfidf_keywords(docs, k=2).collect()}
    ln2 = round(2 * math.log(4.0 / 2.0), 6)      # rare: tf=2, df=1
    lnw = round(1 * math.log(4.0 / 4.0), 6)      # word/the: df=3 -> 0.0
    assert got[(1, 1)] == ("rare", 2, ln2)
    assert got[(1, 2)] == ("the", 1, lnw)        # 'the' < 'word' tie-break
    assert got[(2, 1)] == ("the", 1, 0.0) and got[(2, 2)] == ("word", 1, 0.0)


def test_pagerank_fixed_point_hand_computed(spark):
    """One round on a 4-node graph, hand-computed in integer micro-units:
    scale=1000, n=4 -> r0=250, tele=(100-50)*250//100=125; inflows
    1<-0:250//2=125, 2<-{0:125, 1:250}=375, 0<-2:250, 3 dangling.
    Degree aggregation path (out_deg=None) exercised."""
    from vector_spark.datapipe import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0)], "src long, dst long"
    )
    out = pagerank(nodes, edges, iterations=1, damping_pct=50, scale=1000)
    got = {r.node_id: r.pagerank for r in out.collect()}
    assert got == {0: 250, 1: 187, 2: 312, 3: 125}

    # mass never exceeds scale (floor leakage only shrinks it), any rounds
    total = sum(
        r.pagerank
        for r in pagerank(nodes, edges, iterations=3, damping_pct=85, scale=10**6).collect()
    )
    assert 0 < total <= 10**6


def test_hits_fixed_point_hand_computed(spark):
    """One round on a 4-node graph, hand-computed in integer micro-units.
    scale=1000, n=4 -> a0=250 each. Edges 0->1, 0->2, 1->2, 2->0.
    raw_h: h(0)=a(1)+a(2)=500, h(1)=a(2)=250, h(2)=a(0)=250; H_tot=1000
    -> h = {0:500, 1:250, 2:250, 3 absent}.
    raw_a: a(1)=h(0)=500, a(2)=h(0)+h(1)=750, a(0)=h(2)=250; A_tot=1500
    -> a(0)=250*1000//1500=166, a(1)=500*1000//1500=333, a(2)=500.
    Node 3 (isolated) restored as 0/0 by the final left joins."""
    from vector_spark.datapipe import hits

    nodes = spark.createDataFrame([(i,) for i in range(4)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0)], "src long, dst long"
    )
    out = hits(nodes, edges, iterations=1, scale=1000)
    got = {r.node_id: (r.hub, r.authority) for r in out.collect()}
    assert got == {0: (500, 166), 1: (250, 333), 2: (250, 500), 3: (0, 0)}

    # L1 mass bounded by scale after any rounds (floor leakage only shrinks)
    rows = hits(nodes, edges, iterations=3, scale=10**6).collect()
    assert 0 < sum(r.hub for r in rows) <= 10**6
    assert 0 < sum(r.authority for r in rows) <= 10**6


def test_hits_tree_norm_hash_exact_and_no_window(spark):
    """norm_via_window=False (VERDICT_r4 item 4): identical integer
    output via the broadcast tree-aggregate L1 total, and the executed
    plan carries NO single-partition Window operator."""
    from vector_spark.datapipe import hits

    nodes = spark.createDataFrame([(i,) for i in range(6)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (4, 5), (5, 4), (3, 4)],
        "src long, dst long",
    )
    win = hits(nodes, edges, iterations=2, scale=10**6)
    tree = hits(nodes, edges, iterations=2, scale=10**6,
                norm_via_window=False)
    key = lambda r: r.node_id  # noqa: E731
    assert sorted(map(tuple, win.collect()), key=lambda t: t[0]) == \
        sorted(map(tuple, tree.collect()), key=lambda t: t[0])
    plan = tree._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Window" in win._jdf.queryExecution().executedPlan().toString()


def test_bpe_pair_counts_merge_round(spark):
    """Exact BPE merge-round statistics: pair counts weight by word
    frequency (not doc frequency), case folds, single-char words
    contribute nothing, ranking is count desc then pair text."""
    from vector_spark.datapipe import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "aa AB x"), (2, "ab"), (3, "  aa  ")],
        "doc_id long, text string",
    )
    got = [(r.rank, r.pair_left, r.pair_right, r.pair_count)
           for r in bpe_pair_counts(docs, top_n=10).collect()]
    # words: aa f=2, ab f=2, x f=1 -> pairs (a,a)=2 and (a,b)=2 tie on
    # count, (a,a) wins the text tie-break
    assert got == [(1, "a", "a", 2), (2, "a", "b", 2)]


def test_dedup_ladder_two_tiers(spark):
    """Exact tier collapses identical texts to the min id; near-dup tier
    then removes the higher id of each verified near-dup pair."""
    from vector_spark.datapipe import dedup_ladder

    got = {r.doc_id: r.dup_count for r in dedup_ladder(_docs(spark)).collect()}
    # doc 1 is an exact dup of 0 (removed, dup_count=2 on the survivor);
    # doc 2 is a near-dup of 0 (removed by tier 2); doc 3 survives alone
    assert got == {0: 2, 3: 1}


def test_connected_components_chains_and_singletons(spark):
    """Transitive chains collapse to the min id (pointer jumping crosses
    hops the pair list never states), disjoint clusters stay disjoint,
    singletons are their own size-1 cluster — at any partitioning."""
    from vector_spark.datapipe import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 10)], "doc_id long")
    # path 1-2-3-4-5 (diameter 4 -> needs >1 round), pair 6-7, singletons 8,9
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in connected_components(nodes.repartition(5), pairs).collect()
    }
    assert out == {
        1: (1, 5), 2: (1, 5), 3: (1, 5), 4: (1, 5), 5: (1, 5),
        6: (6, 2), 7: (6, 2), 8: (8, 1), 9: (9, 1),
    }


def test_dedup_clusters_exact_duplicate_component(spark):
    """End-to-end: identical docs land in one cluster keyed by the min id;
    an unrelated doc is a singleton."""
    from vector_spark.datapipe import dedup_clusters

    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),
            (11, "alpha beta gamma delta epsilon zeta"),
            (12, "alpha beta gamma delta epsilon eta"),
            (13, "totally unrelated words appear here only"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.cluster_id, r.cluster_size)
           for r in dedup_clusters(docs, jaccard_threshold=0.5).collect()}
    assert out[10] == (10, 3) and out[11] == (10, 3) and out[12] == (10, 3)
    assert out[13] == (13, 1)


def test_quality_filter_gopher_rules(spark):
    from vector_spark.datapipe import quality_filter_gopher

    long_good = "the data is good and we have many words with solid text here"
    short = "too short"
    symbols = "the ### doc ### with ### junk ### and ### markers ### to drop"
    df = spark.createDataFrame(
        [(1, long_good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in quality_filter_gopher(
        df, min_words=5, min_stopword_hits=1).collect()}
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["ok_word_count"] is False
    assert got[3]["keep"] is False and got[3]["ok_symbols"] is False
    assert got[1]["n_words"] == 13


def test_dedup_spans_word_blocks_first_occurrence_wins(spark):
    """3-word blocks: a block repeated across docs survives only at its
    first (doc_id, span_no) occurrence; doc order is preserved on
    reassembly; a doc whose every span is removed is still emitted."""
    from vector_spark.datapipe import dedup_spans

    df = spark.createDataFrame(
        [
            (0, "a b c d e f"),          # spans: "a b c", "d e f"
            (1, "d e f x y z"),          # "d e f" dup -> removed; keeps "x y z"
            (2, "a b c d e f"),          # both spans dup -> fully removed
            (3, "q r"),                  # short doc: one partial span
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_spans(df, span_words=3).collect()}
    assert out[0].text_dedup == "a b c d e f" and out[0].n_removed == 0
    assert out[1].text_dedup == "x y z" and out[1].n_removed == 1
    assert out[2].text_dedup == "" and out[2].n_removed == 2 and out[2].n_spans == 2
    assert out[3].text_dedup == "q r" and out[3].n_spans == 1


def test_dedup_spans_line_mode_and_min_chars_exemption(spark):
    """span_words=None splits on newlines; min_chars exempts short lines
    (blank separators survive corpus-wide dedup)."""
    from vector_spark.datapipe import dedup_spans

    df = spark.createDataFrame(
        [
            (0, "shared boilerplate footer line\n\nunique first body"),
            (1, "shared boilerplate footer line\n\nunique second body"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_spans(df, span_words=None, min_chars=5).collect()}
    # doc 0 keeps everything (first occurrence); doc 1 loses the footer but
    # keeps its exempt blank line
    assert out[0].text_dedup == "shared boilerplate footer line\n\nunique first body"
    assert out[1].text_dedup == "\nunique second body"
    assert out[1].n_removed == 1


def test_dedup_substrings_kgram_coverage(spark):
    """Lee et al. exact-substring semantics: tokens covered by ANY k-gram
    occurring >=2 times corpus-wide are deleted (both occurrences — no
    first-survivor), overlapping same-doc repeats count, sub-k docs are
    untouched, and a fully-covered doc is emitted empty."""
    from vector_spark.datapipe import dedup_substrings

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # shares 8-gram a..h with doc 2
            (2, "a b c d e f g h x y"),
            (3, "all these words appear here exactly one time"),
            (4, "tiny doc"),              # < k tokens: no grams
            (5, "r r r r r r r r r"),     # overlapping self-repeat
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_substrings(df, k=8).collect()}
    assert len(out) == 5
    assert out[1].text_dedup == "i j" and out[1].n_removed == 8
    assert out[2].text_dedup == "x y" and out[2].n_removed == 8
    assert out[3].n_removed == 0 and out[3].text_dedup.startswith("all these")
    assert out[4].text_dedup == "tiny doc" and out[4].n_removed == 0
    assert out[5].text_dedup == "" and out[5].n_removed == 9 and out[5].n_tokens == 9


def test_image_ahash_near_dup(spark):
    """aHash stub: payload = pre-decoded 8x8 luma grid (tiled), bit j set
    iff luma[j]*64 > total; hamming_pairs over 64-bit fingerprints must
    handle bit-63 windows (arithmetic shiftright sign-extension masked).
    Pair set = brute force: one flipped grid cell -> hamming 1; the
    inverted grid -> hamming 64 (excluded); exact recall at d=3."""
    from vector_spark.datapipe import image_ahash, image_near_dup

    half = bytes([0] * 32 + [255] * 32)          # bits 32..63 set (incl. 63)
    near = bytes([0] * 31 + [255] + [255] * 32)  # bit 31 also set -> hamming 1
    inv = bytes([255] * 32 + [0] * 32)           # complement -> hamming 64
    df = spark.createDataFrame(
        [(1, half), (2, near), (3, inv), (4, half)], "doc_id long, payload binary"
    )
    hashes = {r.doc_id: r.ahash for r in image_ahash(df).collect()}
    assert hashes[1] == hashes[4] == -(1 << 32)  # bits 32..63 -> signed wrap
    assert bin((hashes[1] ^ hashes[2]) & ((1 << 64) - 1)).count("1") == 1

    pairs = {(r.doc_a, r.doc_b): r.hamming for r in image_near_dup(df).collect()}
    assert pairs == {(1, 2): 1, (2, 4): 1, (1, 4): 0}


def test_warc_to_wet_conversion(spark):
    """WET derivation semantics: response blocks convert (HTTP envelope
    stripped at the FIRST blank line only — CRLF pairs inside the html
    body survive into extraction), metadata/request blocks are skipped,
    refers_to carries the source record id, text_bytes counts UTF-8
    octets of the extracted text."""
    from vector_spark.datapipe import warc_to_wet

    html = "<html><body><p>Hello&nbsp;Wéb</p>\r\n\r\n<p>tail here</p></body></html>"
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    )
    rec = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://x.example/1\r\n"
        "WARC-Date: 2024-03-01T12:00:00Z\r\n"
        "WARC-Record-ID: <urn:uuid:r1>\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http.encode('utf-8'))}\r\n\r\n{http}\r\n\r\n"
    )
    meta = "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    df = spark.createDataFrame([(1, rec + meta)], "doc_id long, warc string")
    rows = warc_to_wet(df, keep_cols=("doc_id",)).collect()
    assert len(rows) == 1  # metadata block skipped
    r = rows[0]
    assert r.rec_idx == 0 and r.target_uri == "https://x.example/1"
    assert r.refers_to == "urn:uuid:r1"
    # block <p> tags -> newlines, entity decoded, CRLF run collapsed
    assert r.text == "Hello Wéb\ntail here"
    assert r.text_bytes == len(r.text.encode("utf-8"))


def test_badwords_filter_whole_token(spark):
    """Whole-token semantics: 'scanner' never trips a 'scan' entry;
    occurrences counted per token, distinct per list entry; punctuation
    and case are tokenization-invisible; duplicate/odd-case list entries
    collapse."""
    from vector_spark.datapipe import badwords_filter

    docs = spark.createDataFrame(
        [
            (1, "the scanner scans nothing"),     # substring only -> clean
            (2, "Scan now, SCAN again; grep."),   # 2x scan + 1x grep
            (3, ""),                              # empty -> clean
            (4, "grep-only text"),                # 1x grep
        ],
        "doc_id long, text string",
    )
    out = badwords_filter(docs, words=("scan", "GREP", "scan")).collect()
    got = {r.doc_id: (r.n_bad, r.bad_distinct, r.keep) for r in out}
    assert got == {
        1: (0, 0, True),
        2: (3, 2, False),
        3: (0, 0, True),
        4: (1, 1, False),
    }


def test_c4_line_filter_rules(spark):
    """Published C4 line rules: terminal punctuation required, >=5 words,
    no 'javascript' (case-insensitive); doc keep needs >=min_lines
    survivors and no 'lorem ipsum' / '{' anywhere on the page."""
    from vector_spark.datapipe import c4_line_filter

    good = "one two three four five."
    df = spark.createDataFrame(
        [
            (0, f"{good}\n{good}\nno punctuation line here\nshort line."),
            (1, f"{good}\nuses JavaScript one two three.\n{good}"),
            (2, f"{good}\n{good}\nvar x = {{}}"),  # brace kills the doc
            (3, f"{good}\nlorem ipsum dolor sit amet."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_line_filter(df, min_lines=2).collect()}
    assert out[0].n_lines == 4 and out[0].n_kept == 2 and out[0].keep
    assert out[0].text_clean == f"{good}\n{good}"
    assert out[1].n_kept == 2 and out[1].keep  # javascript line dropped
    assert out[2].n_kept == 2 and not out[2].keep  # brace gate
    assert not out[3].keep  # lorem ipsum gate (and only 2 lines anyway)


def test_split_corpus_group_disjoint_and_deterministic(spark):
    """All rows of a group land on one side; the same seed reproduces the
    same assignment at different parallelism; val_frac=0/1 degenerate."""
    from vector_spark.datapipe import split_corpus

    import hashlib

    rows = [(i, f"text {i}", f"host{i % 19}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = split_corpus(df, val_frac=0.4, group_col="source").collect()
    by_group: dict[str, set] = {}
    for r in out:
        by_group.setdefault(r.source, set()).add(r.split)
    assert all(len(v) == 1 for v in by_group.values()), by_group

    def want(group: str) -> str:
        h = int(hashlib.md5(f"42:{group}".encode()).hexdigest()[:8], 16)
        return "val" if h % 1_000_000 < 400_000 else "train"

    for g, v in by_group.items():
        assert v == {want(g)}, (g, v)
    assert {want(g) for g in by_group} == {"train", "val"}  # both sides hit
    again = {
        r.doc_id: r.split
        for r in split_corpus(
            df.repartition(13), val_frac=0.4, group_col="source"
        ).collect()
    }
    assert again == {r.doc_id: r.split for r in out}
    assert {r.split for r in split_corpus(df, val_frac=0.0).collect()} == {"train"}
    assert {r.split for r in split_corpus(df, val_frac=1.0).collect()} == {"val"}


def test_repetition_filter_gopher_rules(spark):
    """Published Gopher repetition semantics: a doc dominated by one
    repeated 2-gram fails the top-n-gram caps; a clean doc passes every
    rule (a top gram occurring once charges 0); duplicated 5-grams charge
    count*len(gram) characters."""
    from vector_spark.datapipe import repetition_filter_gopher

    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),
            (1, "the quick brown fox jumps over the lazy dog at dawn"),
            (2, "one two three four five one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_filter_gopher(df).collect()}
    # doc 0: "spam spam" occurs 5x (overlapping), 5*9/29 > 1 -> fails
    assert out[0].top_2gram_frac > 0.2 and not out[0].keep
    # doc 1: zero repeated n-grams at any n -> all fracs 0, keep
    assert out[1].top_2gram_frac == 0.0 and out[1].dup_5gram_frac == 0.0
    assert out[1].keep
    # doc 2: "one two three four five" occurs twice -> dup_5gram = 2*23/57
    assert out[2].dup_5gram_frac == round(2 * 23 / 57, 4)
    assert not out[2].ok_dup_5gram and not out[2].keep


def test_chunk_documents_windows_and_tail_rule(spark):
    """Windows advance by stride=chunk-overlap; a tail lying entirely
    inside the previous window's overlap is not emitted; short docs give
    one chunk; invalid overlap rejected."""
    from vector_spark.datapipe import chunk_documents

    df = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10))), (1, "a b c")],
        "doc_id long, text string",
    )
    out = rows(chunk_documents(df, chunk_tokens=5, overlap=2), "doc_id", "chunk_id", "chunk_text", "n_tokens")
    assert (0, 0, "w0 w1 w2 w3 w4", 5) in out
    assert (0, 1, "w3 w4 w5 w6 w7", 5) in out
    assert (0, 2, "w6 w7 w8 w9", 4) in out
    assert (1, 0, "a b c", 3) in out
    assert len([r for r in out if r[0] == 0]) == 3  # no contained tail at start 9

    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_pii_scrub_counts_and_redaction_order(spark):
    """Counts are per-pattern on the original text; redaction applies in
    dict order so a phone also matching the ccn digit-run counts for both
    but redacts as [PHONE]."""
    from vector_spark.datapipe import pii_scrub

    df = spark.createDataFrame(
        [(0, "mail bob@x.com or call +4915112345678, card 4111111111111111 at 10.0.0.1"),
         (1, "nothing here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    r0 = out[0]
    assert (r0.n_email, r0.n_phone, r0.n_ipv4) == (1, 1, 1)
    assert r0.n_ccn == 2  # the 16-digit card AND the phone's digit run
    assert r0.text_redacted == "mail [EMAIL] or call [PHONE], card [CCN] at [IP]"
    assert out[1].text_redacted == "nothing here" and out[1].n_email == 0


def test_sample_stratified_quota_and_determinism(spark):
    """Exactly min(k, |stratum|) rows per stratum; selection identical
    across runs (md5 rank, id tie-break)."""
    from vector_spark.datapipe import sample_stratified

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(30)], "doc_id long, src string"
    )
    a = sorted(r.doc_id for r in sample_stratified(df, ["src"], 4).collect())
    b = sorted(r.doc_id for r in sample_stratified(df, ["src"], 4).collect())
    assert a == b and len(a) == 12
    tiny = spark.createDataFrame([(1, "only")], "doc_id long, src string")
    assert sample_stratified(tiny, ["src"], 4).count() == 1


def test_decontaminate_flags_overlap_and_short_docs(spark):
    """Any shared word-n-gram with the benchmark drops the doc
    (max_frac=0.0); docs shorter than n words have 0 grams and keep=True;
    matching is case-insensitive."""
    from vector_spark.datapipe import decontaminate

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # contains bench 4-gram
            (1, "one two three"),                         # < n words -> 0 grams
            (2, "totally unrelated content right here"),  # clean
            (3, "ALPHA BETA GAMMA DELTA trailing words"), # case-folded hit
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in decontaminate(docs, bench, n=4).collect()}
    assert not out[0].keep and out[0].n_hits == 2      # 2 of its 3 grams hit
    assert out[1].keep and out[1].n_grams == 0 and out[1].n_hits == 0
    assert out[2].keep and out[2].n_hits == 0
    assert not out[3].keep and out[3].n_hits == 1
    assert out[0].contam_frac == round(2 / 3, 4)


def test_shuffle_corpus_deterministic_and_complete(spark):
    """(shard, pos) is a bijection onto the input, positions are
    1..shard_size within each shard, and the assignment is byte-identical
    for different input partitionings (the resume invariant)."""
    from vector_spark.datapipe import shuffle_corpus

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = shuffle_corpus(df, n_shards=4, seed=7)
    rows_a = {(r.shard, r.pos): r.doc_id for r in a.collect()}
    assert len(rows_a) == 200
    by_shard = {}
    for (s, p), _ in rows_a.items():
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) == {0, 1, 2, 3}
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    b = shuffle_corpus(df.repartition(13), n_shards=4, seed=7)
    assert {(r.shard, r.pos): r.doc_id for r in b.collect()} == rows_a
    c = shuffle_corpus(df, n_shards=4, seed=8)
    assert {(r.shard, r.pos): r.doc_id for r in c.collect()} != rows_a


def test_url_filter_normalization_blocklist_and_dedup(spark):
    """Default port + fragment + tracking params + case all collapse to
    one canonical url; non-default ports survive; .co.uk registrable
    domains; blocklist flags by domain."""
    from vector_spark.datapipe import url_filter

    docs = spark.createDataFrame(
        [
            (1, "HTTP://WWW.Ex.COM:80/a?utm_source=f&b=2&a=1#frag"),
            (2, "http://www.ex.com/a?a=1&b=2"),              # same canonical as 1
            (3, "http://www.ex.com:8080/a?a=1&b=2"),          # port kept -> distinct
            (4, "https://news.ex.co.uk/"),                    # bare slash dropped, 3-label domain
            (5, "https://bad.site.org/x?gclid=z"),            # blocklisted
        ],
        "doc_id long, url string",
    )
    block = spark.createDataFrame([("site.org",)], "domain string")
    out = {r.doc_id: r for r in url_filter(docs, block).collect()}
    assert out[1].url_norm == "http://www.ex.com/a?a=1&b=2"
    assert out[1].url_norm == out[2].url_norm
    assert out[1].is_canonical and not out[2].is_canonical
    assert out[3].url_norm == "http://www.ex.com:8080/a?a=1&b=2" and out[3].is_canonical
    assert out[4].url_norm == "https://news.ex.co.uk" and out[4].domain == "ex.co.uk"
    assert out[5].blocked and out[5].url_norm == "https://bad.site.org/x"
    assert not out[1].blocked and out[1].domain == "ex.com"


def test_perplexity_score_buckets_and_external_lm(spark):
    """Common-word docs score lower NLL than rare-word docs; an external
    LM handles OOV via smoothing; zero-token docs get null nll/bucket."""
    from vector_spark.datapipe import perplexity_score, unigram_lm

    docs = spark.createDataFrame(
        [
            (0, "the the the the"),          # most common token
            (1, "the the rare the"),
            (2, "zebra quartz fjord vex"),   # all rare
            (3, "   "),                      # no tokens
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in perplexity_score(docs, head=0.4, middle=0.8).collect()}
    assert out[0].nll < out[1].nll < out[2].nll
    assert out[0].bucket == "head" and out[2].bucket == "tail"
    assert out[3].n_words == 0 and out[3].nll is None and out[3].bucket is None

    lm = unigram_lm(spark.createDataFrame([(0, "a a a b")], "i long, text string"))
    ext = perplexity_score(
        spark.createDataFrame([(0, "a b"), (1, "zzz zzz")], "doc_id long, text string"),
        lm=lm, head=0.7, middle=0.75,
    )
    got = {r.doc_id: r for r in ext.collect()}
    assert got[0].nll < got[1].nll  # OOV doc scores worse, not crashes


def _kn_python_model(doc_tokens, lm_tokens, discount=0.75, head=2.0, middle=2.3):
    """Independent interpolated-KN bigram reference: Chen & Goodman eq.
    4.26 with the Laplace-floored continuation distribution, the <s>
    sentinel, and the repo's exact rounding conventions (6-dp HALF_UP
    log10 terms, exact Decimal sum, 4-dp HALF_UP mean)."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def rnd(x, q):
        return Decimal(repr(x)).quantize(Decimal(q), ROUND_HALF_UP)

    lm, cp, nr, nl = Counter(), Counter(), Counter(), Counter()
    for ws in lm_tokens:
        prev = "<s>"
        for w in ws:
            lm[(prev, w)] += 1
            prev = w
    for (p, w), c in lm.items():
        cp[p] += c
        nr[p] += 1
        nl[w] += 1
    b, v = len(lm), len({w for _, w in lm})

    def prob(p, w):
        pc = (nl.get(w, 0) + 1) / (b + v)
        if p not in cp:
            return pc
        c = lm.get((p, w), 0)
        return max(c - discount, 0.0) / cp[p] + discount * nr[p] / cp[p] * pc

    out = {}
    for i, ws in doc_tokens.items():
        if not ws:
            out[i] = (0, None, None)
            continue
        s, prev = Decimal(0), "<s>"
        for w in ws:
            s += rnd(math.log10(prob(prev, w)), "0.000001")
            prev = w
        nll = float(rnd(-float(s) / len(ws), "0.0001"))
        bucket = "head" if nll <= head else ("middle" if nll <= middle else "tail")
        out[i] = (len(ws), nll, bucket)
    return out


def test_kn_perplexity_matches_python_model(spark):
    """Self-trained and external-LM (OOV context -> continuation-only
    branch) paths both equal the independent python KN model exactly;
    zero-token docs get null nll/bucket."""
    from vector_spark.datapipe import bigram_lm, kn_perplexity

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat"),
        (2, "a dog ran fast"),
        (3, "the dog sat on a mat"),
        (4, "   "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {i: [w for w in t.lower().split() if w] for i, t in rows}

    got = {
        r.doc_id: (r.n_words, r.nll, r.bucket)
        for r in kn_perplexity(docs, head=1.0, middle=1.2).collect()
    }
    want = _kn_python_model(toks, [ws for ws in toks.values() if ws],
                            head=1.0, middle=1.2)
    assert got == want
    assert got[4] == (0, None, None)
    # common-bigram doc scores lower NLL than the rarest-bigram doc
    assert got[1][1] < got[2][1]

    # external LM: doc 2's "ran fast"/"fast ..." contexts are unseen ->
    # the continuation-only branch must fire and still match the model
    lm_rows = [(0, "the cat sat on the mat"), (1, "a dog sat")]
    ext_lm = bigram_lm(spark.createDataFrame(lm_rows, "i long, text string"))
    got_ext = {
        r.doc_id: (r.n_words, r.nll, r.bucket)
        for r in kn_perplexity(docs, lm=ext_lm, head=1.0, middle=1.2).collect()
    }
    want_ext = _kn_python_model(
        toks, [[w for w in t.lower().split()] for _, t in lm_rows],
        head=1.0, middle=1.2,
    )
    assert got_ext == want_ext


def test_corpus_build_stage_gating(spark):
    """Exact duplicates drop at stage 1 (higher id never packs), an
    all-negative model keeps nothing, and with an all-positive model +
    ample budgets every unique doc packs exactly tokens+eos."""
    from vector_spark.datapipe import corpus_build

    docs = spark.createDataFrame(
        [
            (1, "en", "alpha beta gamma"),
            (2, "en", "alpha beta gamma"),      # exact dup of 1
            (3, "en", "delta epsilon"),
            (4, "de", "zeta eta theta iota"),
        ],
        "doc_id long, lang string, text string",
    )
    pos = spark.createDataFrame([(b, 1.0) for b in range(4096)], "bucket long, weight double")
    out = corpus_build(docs, pos, {"en": 100, "de": 100}, seq_len=8)
    got = {}
    for r in out.collect():
        got[r.doc_id] = got.get(r.doc_id, 0) + r.n_tokens
    assert set(got) == {1, 3, 4}            # dup id 2 gone
    assert got[1] == 4 and got[3] == 3 and got[4] == 5   # tokens + eos

    neg = spark.createDataFrame([(b, -1.0) for b in range(4096)], "bucket long, weight double")
    assert corpus_build(docs, neg, {"en": 100, "de": 100}, seq_len=8).count() == 0


def test_pack_sequences_chunking_invariants(spark):
    """Concat-and-chunk invariants: every sequence except each shard's
    last is exactly seq_len tokens with contiguous tiling; every doc's
    slices tile [0, tokens+eos); identical under repartitioning."""
    from collections import defaultdict

    from vector_spark.datapipe import pack_sequences

    rows = [(i, " ".join(f"t{j}" for j in range((i * 5) % 23 + 1))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(docs, seq_len=8, n_shards=4).collect()
    out2 = pack_sequences(docs.repartition(7), seq_len=8, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))

    per_seq, per_doc = defaultdict(list), defaultdict(list)
    for r in out:
        per_seq[(r.shard, r.seq_no)].append(r)
        per_doc[r.doc_id].append(r)
    last_seq = {s: max(q for t, q in per_seq if t == s) for s, _ in per_seq}
    for (shard, seq_no), parts in per_seq.items():
        parts.sort(key=lambda r: r.seq_offset)
        total = sum(p.n_tokens for p in parts)
        if seq_no < last_seq[shard]:
            assert total == 8
        assert parts[0].seq_offset == 0
        for a, b in zip(parts, parts[1:]):
            assert a.seq_offset + a.n_tokens == b.seq_offset
    for i, text in rows:
        parts = sorted(per_doc[i], key=lambda r: r.doc_offset)
        assert parts[0].doc_offset == 0
        for a, b in zip(parts, parts[1:]):
            assert a.doc_offset + a.n_tokens == b.doc_offset
        assert sum(p.n_tokens for p in parts) == len(text.split()) + 1


def test_boilerplate_blocks_justext_rules_and_context_pass(spark):
    """Link-dense blocks are bad; stopword-dense long blocks are good; a
    short block BETWEEN two goods promotes, a trailing short demotes; a
    near-good block promotes next to a good; scripts and entities are
    handled before classification."""
    from vector_spark.datapipe import boilerplate_blocks

    good = "the is of and to in it that this was " * 8
    near = " ".join(["the"] * 10 + [f"wordy{i:02d}" for i in range(22)])
    html = (
        f"<p>{good}<script>var junk = 'x';</script></p>"
        "<p>tiny &amp; note</p>"
        f"<p>{good}</p>"
        f"<p>{near}</p>"
        '<p><a href="#">linky link block</a></p>'
        "<p>tail</p>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = sorted(
        boilerplate_blocks(df).collect(), key=lambda r: r.block_no
    )
    texts_labels = [(r.text.split(" ")[0], r.label) for r in rows]
    assert [lab for _, lab in texts_labels] == [
        "good",   # stopword-dense long block (script content removed)
        "good",   # short, promoted: good on both sides
        "good",
        "good",   # near_good, promoted: good on the left
        "bad",    # all-link block
        "bad",    # trailing short: right edge is not good
    ]
    assert rows[1].text == "tiny & note"          # entity decoded
    assert "junk" not in rows[0].text             # script dropped
    assert rows[4].link_density == 1.0


def test_quality_classifier_matches_local_linear_model(spark):
    """Scores equal a locally computed hashed-ngram linear model (quarter-
    grid weights are exactly representable, so float and DECIMAL sums
    agree); feature-less docs get null score and never keep."""
    import hashlib
    import math

    from vector_spark.datapipe import quality_classifier

    rows = [(0, "Alpha beta alpha"), (1, "gamma delta gamma delta"), (2, "   ")]
    wmap = {b: (b % 5 - 2) / 4 for b in range(16)}
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wdf = spark.createDataFrame(
        [(b, w) for b, w in wmap.items()], "bucket long, weight double"
    )

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % 16

    expect = {}
    for i, text in rows:
        toks = [w for w in text.lower().split() if w]
        fs = toks + [f"{toks[j]} {toks[j + 1]}" for j in range(len(toks) - 1)]
        if not fs:
            expect[i] = (0, None, False)
        else:
            mean = sum(wmap[bucket(f)] for f in fs) / len(fs)
            score = round(1.0 / (1.0 + math.exp(-mean)), 6)
            expect[i] = (len(fs), score, score >= 0.5)

    got = {
        r.doc_id: (r.n_features, r.score, r.keep)
        for r in quality_classifier(docs, wdf, dim=16).collect()
    }
    assert got == expect


def test_mixture_sample_matches_naive_prefix_cut(spark):
    """The hierarchical (bucketed) prefix-sum draw equals the naive
    take-in-md5-order-while-under-budget rule computed locally; groups
    without a budget vanish; result is partitioning-independent."""
    import hashlib

    from vector_spark.datapipe import mixture_sample

    rows = [
        (i, "g" + str(i % 3), " ".join(f"w{j}" for j in range(1 + (i * 7) % 13)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    budgets = {"g0": 40, "g1": 7}          # g2 omitted -> dropped

    expect = {}
    for g, budget in budgets.items():
        order = sorted(
            (r for r in rows if r[1] == g),
            key=lambda r: (hashlib.md5(f"mix|{r[0]}".encode()).hexdigest(), r[0]),
        )
        cum = 0
        for i, _, text in order:
            cum += len(text.split())
            if cum <= budget:
                expect[i] = (g, len(text.split()))

    got = {
        r.doc_id: (r.grp, r.n_tokens)
        for r in mixture_sample(docs, budgets, group_col="grp").collect()
    }
    assert got == expect
    got2 = {
        r.doc_id: (r.grp, r.n_tokens)
        for r in mixture_sample(docs.repartition(11), budgets, group_col="grp").collect()
    }
    assert got2 == expect


def test_dsir_importance_weights_and_resample(spark):
    """Target-like docs get positive log-ratio, source-only docs negative;
    Gumbel-top-k is deterministic across partitionings and never samples
    token-less docs."""
    from vector_spark.datapipe import (
        importance_resample, importance_weights, unigram_lm,
    )

    docs = spark.createDataFrame(
        [
            (0, "clean prose clean prose"),   # pure target vocabulary
            (1, "clean spam prose spam"),     # mixed
            (2, "spam spam spam spam"),       # pure source-junk
            (3, ""),                          # no tokens -> never sampled
        ],
        "doc_id long, text string",
    )
    target = unigram_lm(
        spark.createDataFrame([(0, "clean prose clean prose")], "i long, text string")
    )
    w = {r.doc_id: r for r in importance_weights(docs, target).collect()}
    assert w[0].log_ratio > w[1].log_ratio > w[2].log_ratio
    assert w[0].log_ratio > 0 > w[2].log_ratio
    assert w[3].n_words == 0 and w[3].log_ratio is None

    top = importance_resample(docs, 3, target, temperature=0.01)
    ids = [r.doc_id for r in top.collect()]
    # near-zero temperature -> pure exploitation: ranked by log_ratio
    assert ids == [0, 1, 2]
    again = [r.doc_id for r in importance_resample(
        docs.repartition(7), 3, target, temperature=0.01).collect()]
    assert again == ids


def test_extract_html_text(spark):
    """Scripts/styles/comments vanish, block tags become line breaks,
    entities decode single-pass (&amp;lt; -> &lt;), whitespace collapses;
    invalid UTF-8 html decodes with replacement chars instead of raising."""
    from vector_spark.datapipe import extract_html_text

    html = (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script type='text/js'>var x = '<p>not text</p>';</script></head>"
        "<body><!-- hidden --><h1>Head&nbsp;line</h1>"
        "<p>First   para with &amp;lt; literal &quot;quoted&#39;</p>"
        "<div>Second<br>third</div>  trailing</body></html>"
    )
    docs = spark.createDataFrame(
        [("u1", html.encode()), ("u2", b"plain \xff\xfe bytes"), ("u3", None)],
        "url string, html binary",
    )
    out = {r.url: r for r in extract_html_text(docs).collect()}
    assert out["u1"].text == (
        "T\nHead line\nFirst para with &lt; literal \"quoted'\nSecond\nthird\ntrailing"
    )
    assert out["u1"].n_lines == 6
    assert "�" in out["u2"].text  # replacement chars, no raise
    assert out["u3"].text is None and out["u3"].n_lines is None


def test_frame_and_parse_warc(spark):
    """A two-record WARC stream frames into both records (Content-Length
    counts BYTES — the first payload is non-ASCII); header structs parse
    field-exact; a truncated tail yields only complete records."""
    from pyspark.sql import functions as F

    from vector_spark.functions import frame_warc, parse_warc_record

    p1 = "héllo wörld"          # 13 bytes utf-8, 11 chars
    p2 = "<html>x</html>"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://ex.com/a\r\n"
        "WARC-Date: 2024-05-01T12:00:00Z\r\n"
        "WARC-Record-ID: <urn:uuid:aaaa-bbbb>\r\n"
        "Content-Type: application/http\r\n"
        f"Content-Length: {len(p1.encode())}\r\n"
        "\r\n" + p1 + "\r\n\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"Content-Length: {len(p2)}\r\n"
        "\r\n" + p2 + "\r\n\r\n"
        "WARC/1.0\r\nWARC-Type: truncated\r\nContent-Length: 999\r\n\r\nshort"
    )
    df = spark.createDataFrame([(rec,)], "buf string")
    recs = df.select(F.posexplode(frame_warc(F.col("buf"))).alias("i", "rec"))
    parsed = recs.select("i", parse_warc_record(F.col("rec")).alias("w")).select(
        "i", "w.*"
    )
    rows = {r.i: r for r in parsed.collect()}
    assert len(rows) == 2  # truncated third record dropped
    r0, r1 = rows[0], rows[1]
    assert r0.warc_type == "response" and r0.target_uri == "http://ex.com/a"
    assert r0.record_id == "urn:uuid:aaaa-bbbb"
    assert r0.content_length == 13 and r0.payload == p1
    assert str(r0.warc_date) == "2024-05-01 12:00:00"
    assert r1.warc_type == "conversion" and r1.payload == p2
    assert r1.target_uri is None and r1.record_id is None


def test_dataset_build_no_val_leakage_and_conservation(spark):
    """The packed output contains ONLY train-side docs (group-disjoint
    split), and each doc's packed slices sum to its deduped BPE token
    count + 1 (eos)."""
    import hashlib

    from pyspark.sql import functions as F

    from vector_spark.datapipe import (
        bpe_encode, dataset_build, dedup_substrings,
    )
    from vector_spark.datapipe.bpe import bpe_learn

    rows = [
        (i, f"doc {i} words alpha beta gamma delta tick tock", f"s{i % 5}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    merges = bpe_learn(df, num_merges=4)
    out = dataset_build(df, merges, k=8, val_frac=0.5, group_col="source", seq_len=16)

    def side(group):
        h = int(hashlib.md5(f"42:{group}".encode()).hexdigest()[:8], 16)
        return "val" if h % 1_000_000 < 500_000 else "train"

    train_ids = {i for i, _, s in rows if side(s) == "train"}
    assert 0 < len(train_ids) < len(rows)  # both sides populated
    got = out.groupBy("doc_id").agg(F.sum("n_tokens").alias("tot")).collect()
    assert {r.doc_id for r in got} == train_ids

    dd = dedup_substrings(df, k=8)
    enc = {
        r.doc_id: len(r.tokens)
        for r in bpe_encode(
            dd.select("doc_id", F.col("text_dedup")), merges, text_col="text_dedup"
        ).collect()
    }
    for r in got:
        assert r.tot == enc[r.doc_id] + 1, (r.doc_id, r.tot, enc[r.doc_id])


def test_dedup_substrings_null_text(spark):
    """NULL text behaves as '' — non-null outputs for every input doc
    (review fix: matches the oracle's coalesce)."""
    from vector_spark.datapipe import dedup_substrings

    df = spark.createDataFrame(
        [(1, None), (2, "a b c d e f g h")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dedup_substrings(df, k=8).collect()}
    assert out[1].text_dedup == "" and out[1].n_tokens == 1  # split('')=['']
    assert out[1].n_removed == 0
    assert out[2].n_tokens == 8


def test_split_corpus_null_group_goes_train(spark):
    """A NULL group key propagates (strict concat) -> deterministic
    'train' on both engines, never a pseudo-group of the bare seed."""
    from vector_spark.datapipe import split_corpus

    df = spark.createDataFrame(
        [(1, "t", None), (2, "t", "hostA")], "doc_id long, text string, source string"
    )
    out = {r.doc_id: r.split for r in split_corpus(df, val_frac=0.99, group_col="source").collect()}
    assert out[1] == "train"  # null group: fallback side even at 99% val


def test_bloom_filter_no_false_negatives(spark):
    """Every delta text that IS in the corpus must flag maybe_dup=true —
    Bloom filters cannot have false negatives; a miss here means the
    build/probe hash families diverged."""
    from vector_spark.datapipe import bloom_filter_build, bloom_filter_probe

    corpus_texts = [f"shared document number {i}" for i in range(50)] + [
        "corpus only text alpha", "corpus only text beta"]
    corpus = spark.createDataFrame([(t,) for t in corpus_texts], "text string")
    delta = spark.createDataFrame(
        [(i, f"shared document number {i}") for i in range(50)],
        "doc_id long, text string")
    bloom = bloom_filter_build(corpus, "text")
    got = {r.doc_id: r.maybe_dup
           for r in bloom_filter_probe(delta, bloom, "text", "doc_id").collect()}
    assert got == {i: True for i in range(50)}


def test_bloom_filter_fresh_texts_pass(spark):
    """Texts absent from the corpus come back maybe_dup=false at this
    m/k/n operating point (2^20 bits, k=5, 52 corpus docs: FP rate ~1e-13;
    the fixture is deterministic so this is a stable assertion, not a
    probabilistic one)."""
    from vector_spark.datapipe import bloom_filter_build, bloom_filter_probe

    corpus = spark.createDataFrame(
        [(f"corpus text {i}",) for i in range(52)], "text string")
    delta = spark.createDataFrame(
        [(i, f"novel text {i}") for i in range(20)], "doc_id long, text string")
    bloom = bloom_filter_build(corpus, "text")
    got = {r.doc_id: r.maybe_dup
           for r in bloom_filter_probe(delta, bloom, "text", "doc_id").collect()}
    assert got == {i: False for i in range(20)}


def test_bloom_filter_matches_python_reference(spark):
    """Bit-exact vs an independent pure-Python Bloom implementation using
    the same md5 position family (the oracle's math, re-derived)."""
    from vector_spark.datapipe import bloom_filter_build, bloom_filter_probe

    m, k = 1 << 20, 5

    def positions(text):
        return [int(hashlib.md5(f"{i}|{text}".encode()).hexdigest()[:15], 16) % m
                for i in range(k)]

    corpus_texts = [f"doc {i} payload" for i in range(40)]
    bits = set()
    for t in corpus_texts:
        bits.update(positions(t))
    probe_texts = [(i, f"doc {i} payload" if i % 2 == 0 else f"fresh {i}")
                   for i in range(10)]
    expected = {i: all(p in bits for p in positions(t)) for i, t in probe_texts}

    corpus = spark.createDataFrame([(t,) for t in corpus_texts], "text string")
    delta = spark.createDataFrame(probe_texts, "doc_id long, text string")
    bloom = bloom_filter_build(corpus, "text")
    got = {r.doc_id: r.maybe_dup
           for r in bloom_filter_probe(delta, bloom, "text", "doc_id").collect()}
    assert got == expected
    # the sparse word table matches the reference bit-for-bit
    words = {}
    for p in bits:
        words[p // 63] = words.get(p // 63, 0) | (1 << (p % 63))
    spark_words = {r.word_idx: r.word_bits for r in bloom.collect()}
    assert spark_words == words


def test_count_min_guarantee_and_merge(spark):
    """est >= exact for every value (count-min one-sided error); a sketch
    over the union equals the merged per-part sketches cell-for-cell; and
    with a tiny width, collisions visibly overcount (the estimator is a
    real sketch, not a disguised exact count)."""
    from vector_spark.datapipe import (
        count_min_build, count_min_estimate, count_min_merge)

    a = spark.createDataFrame(
        [(f"v{i % 7}",) for i in range(70)], "v string")
    b = spark.createDataFrame(
        [(f"v{i % 5}",) for i in range(50)], "v string")
    both = a.union(b)
    exact = {r.v: r.c for r in
             both.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()}

    sk = count_min_build(both, "v")
    est = {r.v: r.est_count for r in
           count_min_estimate(both.distinct(), sk, "v").collect()}
    assert set(est) == set(exact)
    assert all(est[v] >= exact[v] for v in exact)
    assert est == exact  # width 2048 >> 7 values: no collisions

    merged = count_min_merge(count_min_build(a, "v"), count_min_build(b, "v"))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sk.collect()))

    # tiny width forces collisions -> strict overcount somewhere
    sk2 = count_min_build(both, "v", depth=2, width=2)
    est2 = {r.v: r.est_count for r in
            count_min_estimate(both.distinct(), sk2, "v", depth=2, width=2)
            .collect()}
    assert all(est2[v] >= exact[v] for v in exact)
    assert any(est2[v] > exact[v] for v in exact)


def test_heavy_hitters_threshold(spark):
    from vector_spark.datapipe import heavy_hitters

    df = spark.createDataFrame(
        [("hot",)] * 60 + [("warm",)] * 30 + [(f"cold{i}",) for i in range(10)],
        "v string")
    got = {r.v: (r.cnt, r.share) for r in
           heavy_hitters(df, "v", min_share=0.2).collect()}
    assert got == {"hot": (60, 0.6), "warm": (30, 0.3)}


def test_hll_accuracy_and_merge(spark):
    """HLL estimate within the 3*1.04/sqrt(m) error band at n=5000
    (p=12 -> ~1.6% sigma), merge-by-bucket-max equals the union sketch,
    and the tiny-n linear-counting regime is near-exact."""
    from vector_spark.datapipe import hll_estimate, hll_merge, hll_sketch

    a = spark.createDataFrame([(f"u{i}",) for i in range(3000)], "v string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(2000, 5000)], "v string")
    union = a.union(b)  # 5000 distinct, 1000 overlapping
    est = hll_estimate(hll_sketch(union, "v")).collect()[0].n_est
    assert abs(est - 5000) / 5000 < 0.05

    merged = hll_merge(hll_sketch(a, "v"), hll_sketch(b, "v"))
    est_m = hll_estimate(merged).collect()[0].n_est
    assert est_m == est  # overlap-safe lossless merge

    small = spark.createDataFrame([(f"s{i}",) for i in range(40)], "v string")
    est_s = hll_estimate(hll_sketch(small, "v")).collect()[0].n_est
    assert abs(est_s - 40) <= 2  # linear counting regime


def test_decode_gzip_members_warc_layout(spark):
    """Concatenated gzip members (the Common Crawl WARC container layout)
    split back into per-record payloads; plain single-member buffers give
    a one-element array."""
    import gzip

    from vector_spark.functions import decode_gzip_members

    recs = [b"WARC/1.0 record one", b"record two", b"tail"]
    multi = b"".join(gzip.compress(r, mtime=0) for r in recs)
    single = gzip.compress(b"only", mtime=0)
    df = spark.createDataFrame([(multi,), (single,), (None,)], "b binary")
    got = [r.m and [bytes(x) for x in r.m]
           for r in df.select(decode_gzip_members(F.col("b")).alias("m")).collect()]
    assert got == [recs, [b"only"], None]


def test_hll_grouped_matches_per_group_sketches(spark):
    """Grouped register tables: hll_estimate(group_cols=[g]) per group must
    equal running the ungrouped sketch on each group's slice — the grouped
    path changes the shuffle key, never the math. Grouped merge keys on
    (group, bucket)."""
    from vector_spark.datapipe import hll_estimate, hll_merge, hll_sketch

    df = spark.createDataFrame(
        [(("a" if i % 3 else "b"), f"u{i % 700}") for i in range(2000)],
        "g string, v string")
    grouped = hll_estimate(
        hll_sketch(df, "v", group_cols=["g"]), group_cols=["g"])
    got = {r.g: r.n_est for r in grouped.collect()}
    for g in ("a", "b"):
        solo = hll_estimate(
            hll_sketch(df.filter(F.col("g") == g), "v")).collect()[0].n_est
        assert got[g] == solo
    merged = hll_merge(hll_sketch(df, "v", group_cols=["g"]),
                       hll_sketch(df, "v", group_cols=["g"]),
                       group_cols=["g"])
    est_m = {r.g: r.n_est
             for r in hll_estimate(merged, group_cols=["g"]).collect()}
    assert est_m == got  # idempotent merge (max is idempotent)
    # incidental extra columns must NOT widen the register key: a sketch
    # carrying a metadata column merges identically (the column is
    # projected away, buckets still collapse)
    meta = hll_sketch(df, "v", group_cols=["g"]).withColumn(
        "_batch_id", F.lit(7))
    est_meta = {r.g: r.n_est for r in hll_estimate(
        hll_merge(meta, meta, group_cols=["g"]),
        group_cols=["g"]).collect()}
    assert est_meta == got


def test_decontaminate_semantic_flags_and_ties(spark):
    """Hand-checked broadcast-fold argmax: nearest benchmark id, rounded-6
    cosine, lowest-bench-id tie-break, keep = max_cos < threshold, and the
    empty-benchmark edge (bid -1, max_cos -2.0, everything kept)."""
    from vector_spark.datapipe import decontaminate_semantic

    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),   # cos 1.0 with bench 1 AND bench 2 (tie -> 1)
            (11, [0.0, 1.0]),   # orthogonal to both -> cos 0.0
            (12, [1.0, 1.0]),   # cos ~0.7071 with both (tie -> 1)
        ],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [3.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: (r.bench_id, r.max_cos, r.keep)
        for r in decontaminate_semantic(corpus, bench, threshold=0.9).collect()
    }
    assert got[10] == (1, 1.0, False)        # contaminated, tie broke low
    assert got[11] == (1, 0.0, True)
    assert got[12][0] == 1 and abs(got[12][1] - 0.707107) < 1e-6 and got[12][2]

    empty = bench.filter("vec_id < 0")
    got0 = {
        r.vec_id: (r.bench_id, r.max_cos, r.keep)
        for r in decontaminate_semantic(corpus, empty, threshold=0.9).collect()
    }
    assert all(v == (-1, -2.0, True) for v in got0.values())


def test_temperature_budgets_hand_math(spark):
    """Hand-checked temperature shares: totals {a:100, b:400} tokens.
    T=1 -> proportional (60/240 of 300); T=2 -> sqrt weights 10:20 ->
    (100/200 of 300). Null-lang and empty-text rows are excluded."""
    from vector_spark.datapipe import temperature_budgets

    rows_ = (
        [(i, "a", "w " * 10) for i in range(10)]        # 100 tokens
        + [(100 + i, "b", "w " * 20) for i in range(20)]  # 400 tokens
        + [(999, None, "ignored"), (998, "c", "")]
    )
    d = spark.createDataFrame(rows_, "doc_id long, lang string, text string")
    assert temperature_budgets(d, 300, temperature=1.0) == {"a": 60, "b": 240}
    assert temperature_budgets(d, 300, temperature=2.0) == {"a": 100, "b": 200}


def test_ngram_jaccard_null_text_and_threshold_validation(spark):
    """NULL text is treated as '' by every method (the bitmap kernel used
    to TypeError on len(None), and a raw null gram would survive brute's
    array_intersect yet vanish from the index methods' equi-joins, breaking
    the IDENTICAL-output contract); threshold outside (0,1] is rejected up
    front — at 0 every disjoint pair qualifies, which only an all-pairs
    enumeration could emit."""
    import pytest

    from vector_spark.datapipe import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(0, "abcabc"), (1, None), (2, ""), (3, "abcabc")],
        "doc_id int, text string",
    )
    got = {
        m: sorted(rows(ngram_jaccard_pairs(df, threshold=0.3, method=m),
                       "doc_a", "doc_b", "jaccard"))
        for m in ("counts", "prefix", "brute", "bitmap")
    }
    assert got["counts"] == got["prefix"] == got["brute"] == got["bitmap"]
    # null and "" both shingle to {""}: pair (1,2) is an exact dup, as is (0,3)
    assert (1, 2, 1.0) in got["brute"] and (0, 3, 1.0) in got["brute"]
    assert len(got["brute"]) == 2

    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            ngram_jaccard_pairs(df, threshold=bad)


def test_quantize_embeddings_error_bound_and_zero(spark):
    from vector_spark.datapipe import quantize_embeddings

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector -> zeros, scale 0
        (3, [127.0, -127.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[2]["scale"] == 0.0 and list(out[2]["qvec"]) == [0, 0, 0, 0]
    # max-magnitude element always hits +/-127; dequantized error <= scale/2
    for vid, emb in ((1, rows[0][1]), (3, rows[2][1])):
        q, s = out[vid]["qvec"], out[vid]["scale"]
        assert max(abs(x) for x in q) == 127
        for orig, qi in zip(emb, q):
            assert abs(orig - qi * s) <= s / 2 + 1e-12
        assert all(-127 <= x <= 127 for x in q)


def test_quantized_topk_close_to_float_topk(spark):
    """Int8 quantization at dims=64 keeps the brute-force neighbor
    ranking nearly intact: top-5 sets overlap >= 4/5 for every query and
    scores agree within 1e-2."""
    from vector_spark.datapipe import cosine_topk, quantized_cosine_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    f = cosine_topk(df, query_ids=[0, 1, 2], k=5).collect()
    qz = quantized_cosine_topk(df, query_ids=[0, 1, 2], k=5).collect()
    fs = {}
    qs = {}
    for r in f:
        fs.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cosine"]
    for r in qz:
        qs.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cosine_q"]
    for qid in (0, 1, 2):
        overlap = set(fs[qid]) & set(qs[qid])
        assert len(overlap) >= 4
        for nid in overlap:
            assert abs(fs[qid][nid] - qs[qid][nid]) < 1e-2
