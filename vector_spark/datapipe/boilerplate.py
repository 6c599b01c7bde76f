"""Boilerplate / content block classification (jusText-style).

C4 strips tags; production web-text curation goes further and removes
BOILERPLATE — navigation, footers, link farms — keeping only content
blocks. The canonical algorithm is jusText (Pomikálek 2011): segment the
page into blocks at block-level tags, classify each block context-free by
link density / stopword density / length, then let 'short' and
'near-good' blocks inherit from their decided neighbors.

This is that algorithm as pure Column expressions over the same
Java∩RE2 pattern subset as html.py (the oracle replays every constant
verbatim), with one simplification, disclosed: the context pass uses the
nearest DECIDED (good/bad) neighbor on each side via ignore-nulls window
functions — near-good promotes if EITHER side is good, short promotes
only if BOTH are (page edges count as bad) — rather than jusText's full
iterative relabeling; and the stopword list is a compact English top-30
(jusText ships per-language lists; swap via the `stopwords` parameter).

Scale shape: block split + per-block features are a narrow map over the
scan; the only window partitions by (doc), bounded by blocks-per-page —
no corpus-scale skew. Nothing but (id, block features) ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .html import BLOCK_TAG_PATTERN, DROP_PATTERNS, ENTITIES, TAG_PATTERN

ANCHOR_PATTERN = r"(?is)<a\b[^>]*>(.*?)</a>"
WS_PATTERN = r"[ \t\r\n\f]+"

# compact English stopword list (top function words); jusText uses
# per-language lists of hundreds — pass your own for other languages.
JUSTEXT_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "was", "for", "on", "are", "as", "with", "at", "be",
    "by", "from", "has", "he", "she", "they", "we", "you", "not", "have",
]


def _block_text(raw: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-collapse one block fragment."""
    out = F.regexp_replace(raw, TAG_PATTERN, "")
    for ent, rep in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.btrim(F.regexp_replace(out, WS_PATTERN, " "), F.lit(" "))


def boilerplate_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
) -> DataFrame:
    """Per-block boilerplate classification of an HTML column. Returns
    (id_col, block_no, text, n_chars, n_words, link_density,
    stopword_density, label) for every non-empty block; `label` is
    'good' or 'bad' after the context pass (filter label='good' and
    re-join blocks for the content text). Thresholds are jusText's
    defaults (length 70/200, stopwords 0.30/0.32, link density 0.2).

    Context-free classes: bad on link-dense, short under length_low,
    good/near_good by stopword density (good needs length_high), bad on
    low stopword density. Context pass: see module docstring."""
    from pyspark.sql import Window

    stops = stopwords or JUSTEXT_STOPWORDS
    cleaned = F.col(html_col)
    for pat in DROP_PATTERNS:
        cleaned = F.regexp_replace(cleaned, pat, "")
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(cleaned, BLOCK_TAG_PATTERN)).alias("block_no", "_raw"),
    )
    link_chars = F.aggregate(
        F.regexp_extract_all(F.col("_raw"), F.lit(ANCHOR_PATTERN), F.lit(1)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(F.regexp_replace(x, TAG_PATTERN, "")),
    )
    feat = blocks.select(
        id_col,
        "block_no",
        _block_text(F.col("_raw")).alias("text"),
        link_chars.alias("_lc"),
    ).filter(F.length("text") > 0)
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    n_chars = F.length("text")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.lower(w).isin(stops)))
    ld = F.col("_lc").cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    sd = n_stop.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    cls = (
        F.when(ld > max_link_density, F.lit("bad"))
        .when(n_chars < length_low, F.lit("short"))
        .when(
            sd >= stopwords_high,
            F.when(n_chars > length_high, F.lit("good")).otherwise(F.lit("near_good")),
        )
        .when(sd >= stopwords_low, F.lit("near_good"))
        .otherwise(F.lit("bad"))
    )
    staged = feat.select(
        id_col,
        F.col("block_no").cast("long").alias("block_no"),
        "text",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(ld, 4).alias("link_density"),
        F.round(sd, 4).alias("stopword_density"),
        cls.alias("_cls"),
    )
    decided = F.when(F.col("_cls").isin("good", "bad"), F.col("_cls"))
    wprev = (
        Window.partitionBy(id_col)
        .orderBy("block_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wnext = (
        Window.partitionBy(id_col)
        .orderBy("block_no")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev = F.last(decided, ignorenulls=True).over(wprev)
    nxt = F.first(decided, ignorenulls=True).over(wnext)
    label = (
        F.when(F.col("_cls") == "good", F.lit("good"))
        .when(F.col("_cls") == "bad", F.lit("bad"))
        .when(
            F.col("_cls") == "near_good",
            F.when((prev == "good") | (nxt == "good"), F.lit("good")).otherwise(
                F.lit("bad")
            ),
        )
        .otherwise(
            F.when((prev == "good") & (nxt == "good"), F.lit("good")).otherwise(
                F.lit("bad")
            )
        )
    )
    return staged.select(
        id_col, "block_no", "text", "n_chars", "n_words",
        "link_density", "stopword_density", label.alias("label"),
    )
