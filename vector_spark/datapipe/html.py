"""HTML -> text extraction for web-crawl curation (C4-style).

The north-rule corpus is Common-Crawl-style pages whose `html` payload must
become training text (C4, Raffel et al. 2020 §2.1 extracts "only the
natural-language text" before any filtering). This is the extraction step,
kept deliberately engine-deterministic: same bytes in -> same text out, on
any executor count and in the DuckDB oracle.

Everything is a chain of regexp_replace / literal-replace COLUMN
expressions — JVM whole-stage codegen, scan-speed, no UDF, no shuffle.
Patterns are held to the Java-regex ∩ RE2 common subset ((?is) flags,
non-greedy, char classes; no lookaround, no backrefs) so the DuckDB oracle
runs the IDENTICAL pattern list verbatim;
`entry_queries.oracle_helpers._html_text_sql` is generated from the
constants below, so Spark and oracle cannot drift.

Steps (each a public constant so the oracle builder imports them):
  1. DROP_PATTERNS — script/style blocks and HTML comments vanish whole.
  2. BLOCK_TAG_PATTERN — block-level tags become newlines (paragraph
     structure survives tag stripping; C4 filters operate on lines).
  3. TAG_PATTERN — every remaining tag is stripped.
  4. ENTITIES — the universal named entities decode (amp LAST, so
     '&amp;lt;' decodes to '&lt;' not '<' — single-pass semantics).
  5. whitespace: horizontal runs -> one space, newline runs (with
     surrounding spaces) -> one newline, trim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?is): case-insensitive + dotall; non-greedy bodies. Scripts/styles keep
# their raw content out of the text; comments likewise.
DROP_PATTERNS = [
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
]

# block-level elements whose boundaries are line boundaries in the text
BLOCK_TAG_PATTERN = (
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|thead|tbody|"
    r"section|article|header|footer|nav|aside|blockquote|pre|form)\b[^>]*>"
)

TAG_PATTERN = r"(?s)<[^>]*>"

# decode order matters: &amp; LAST (see module docstring)
ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]

HSPACE_PATTERN = r"[ \t\r\f]+"
NEWLINE_PATTERN = r" ?\n[ \n]*"


def html_text_expr(col: Column) -> Column:
    """The extraction chain as one Column expression (composable into any
    scan projection — curation_pipeline-style fusion)."""
    out = col
    for pat in DROP_PATTERNS:
        out = F.regexp_replace(out, pat, "")
    out = F.regexp_replace(out, BLOCK_TAG_PATTERN, "\n")
    out = F.regexp_replace(out, TAG_PATTERN, "")
    for ent, rep in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, HSPACE_PATTERN, " ")
    out = F.regexp_replace(out, NEWLINE_PATTERN, "\n")
    # trim spaces AND newlines (DuckDB twin: trim(x, ' ' || chr(10)))
    return F.btrim(out, F.lit(" \n"))


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    id_cols: tuple[str, ...] = ("url",),
    decode: bool = True,
) -> DataFrame:
    """Extract text from an HTML column (binary or string) alongside the
    id columns, plus line/char counts for downstream line-level filters.

    `decode=True` decodes a binary html column as UTF-8 first — real-web
    invalid byte runs become replacement chars, never errors
    (spark.sql.legacy.codingErrorAction, set by session.get_spark).

    Narrow map over the scan — no shuffle, no UDF; at 100 TB this runs at
    whatever the parquet scan runs at. The heavy dotall regexes are the
    cost center: ~O(len(html)) each, fused into one codegen stage."""
    src = F.col(html_col)
    if decode:
        src = F.decode(src.cast("binary"), "UTF-8")
    text = html_text_expr(src)
    return df.select(
        *[F.col(c) for c in id_cols],
        text.alias("text"),
        F.length(text).alias("n_chars"),
        F.when(F.length(text) == 0, F.lit(0))
        .otherwise(F.size(F.split(text, r"\n")))
        .cast("int")
        .alias("n_lines"),
    )


# the HTTP response envelope inside a WARC response block: status line +
# header lines up to the first blank line (Java ∩ RE2 subset — dotall +
# non-greedy, no lookaround — so the oracle could run it verbatim)
HTTP_HEADER_PATTERN = r"(?s)^HTTP/[^\r\n]*\r\n.*?\r\n\r\n"


def warc_to_wet(
    df: DataFrame,
    buf_col: str = "warc",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Common Crawl WET derivation: WARC response records -> one
    'conversion' record per fetched page whose payload is the extracted
    text (the *.warc.wet.gz files CC publishes next to every crawl; the
    WARC 1.1 'conversion' record type, ISO 28500 §6.8). The step chain is
    the real generator's: frame the stream -> parse records -> keep
    `response` blocks -> strip the inner HTTP/1.x envelope (a response
    block's payload is the full HTTP message; the text begins after its
    first blank line) -> html_text_expr.

    Emits (keep_cols..., rec_idx, target_uri, warc_date, refers_to, text,
    text_bytes): refers_to = the source record's WARC-Record-ID, exactly
    how WET conversion records back-reference their response record;
    text_bytes = the conversion block's Content-Length (UTF-8 octets).

    Scale: frame_warc is a per-buffer Arrow walk (embarrassingly parallel
    across WARC files); everything after is pure codegen expressions on
    the exploded records — no shuffle anywhere, so this runs at scan
    speed like extract_html_text."""
    from ..functions.parse import frame_warc, parse_warc_record

    recs = df.select(
        *[F.col(c) for c in keep_cols],
        F.posexplode(frame_warc(F.col(buf_col))).alias("rec_idx", "_rec"),
    ).select(
        *[F.col(c) for c in keep_cols],
        "rec_idx",
        parse_warc_record(F.col("_rec")).alias("_w"),
    )
    body = F.regexp_replace(F.col("_w.payload"), HTTP_HEADER_PATTERN, "")
    text = html_text_expr(body)
    return recs.filter(F.col("_w.warc_type") == "response").select(
        *[F.col(c) for c in keep_cols],
        "rec_idx",
        F.col("_w.target_uri").alias("target_uri"),
        F.col("_w.warc_date").alias("warc_date"),
        F.col("_w.record_id").alias("refers_to"),
        text.alias("text"),
        F.octet_length(text).cast("long").alias("text_bytes"),
    )
