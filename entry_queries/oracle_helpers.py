"""DuckDB-oracle SQL builder helpers (split from __spark_entry__.py)."""

from __future__ import annotations

from .common import _BP_NAV, _BP_LEAD, _BP_TAIL  # noqa: F401

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


# the q_html_text / q_wet_extract planted page as a DuckDB expression —
# shared so the WET oracle reuses the exact same ground truth
_PLANTED_PAGE_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
    "'</title><style>p {color: red}</style>"
    "<script>var t = 1 < 2;</script></head>"
    "<body><!-- crawler metadata --><h1>Doc&nbsp;' || "
    "CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
    "'</p><div>tail &amp;lt; end</div></body></html>'"
)


def _html_chain_sql(expr: str) -> str:
    """Apply datapipe.html's FULL extraction chain to a DuckDB expression —
    generated from the pattern constants (the aggregate_sketch
    shared-constant rule — one source of truth)."""
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

    for pat in DROP_PATTERNS:
        expr = f"regexp_replace({expr}, {q(pat)}, '', 'g')"
    expr = f"regexp_replace({expr}, {q(BLOCK_TAG_PATTERN)}, chr(10), 'g')"
    expr = f"regexp_replace({expr}, {q(TAG_PATTERN)}, '', 'g')"
    for ent, rep in ENTITIES:
        expr = f"replace({expr}, {q(ent)}, {q(rep)})"
    expr = f"regexp_replace({expr}, {q(HSPACE_PATTERN)}, ' ', 'g')"
    expr = f"regexp_replace({expr}, {q(NEWLINE_PATTERN)}, chr(10), 'g')"
    return f"trim({expr}, ' ' || chr(10))"


def _html_text_sql() -> str:
    """DuckDB twin of q_html_text: the page build + the extraction chain."""
    expr = _html_chain_sql(_PLANTED_PAGE_SQL)
    return f"""
WITH ext AS (SELECT doc_id, {expr} AS text FROM documents)
SELECT doc_id, text, length(text) AS n_chars,
       CAST(CASE WHEN length(text) = 0 THEN 0
                 ELSE len(string_split(text, chr(10))) END AS INTEGER) AS n_lines
FROM ext
"""


def _wet_sql() -> str:
    """DuckDB twin of q_wet_extract: the expected WET conversion records
    rebuilt directly from documents — ground truth by construction. The
    response record is always frame index 0, its WET headers are doc_id
    arithmetic, and the text is the extraction chain over the planted page
    (the HTTP envelope the Spark side must strip never enters here)."""
    expr = _html_chain_sql(_PLANTED_PAGE_SQL)
    return f"""
WITH ext AS (SELECT doc_id, {expr} AS text FROM documents)
SELECT doc_id, 0 AS rec_idx,
       'https://crawl.example/d/' || CAST(doc_id AS VARCHAR) AS target_uri,
       epoch_us(TIMESTAMP '2024-03-01 12:00:00') AS warc_date_us,
       'urn:uuid:resp-' || CAST(doc_id AS VARCHAR) AS refers_to,
       text,
       CAST(strlen(text) AS BIGINT) AS text_bytes
FROM ext
"""


