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
