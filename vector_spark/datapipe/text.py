"""Text analysis for training-data curation: quality scoring, token
counting, fingerprinting, n-gram language ID.

All pure column expressions (codegen, zero Python, no shuffle) — at 100 TB
these run at scan speed inside the same stage as the parquet read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import ensure_parallelism

MOD = 1_000_000_007

STOPWORDS = ["the", "a", "and", "of", "to"]

# wordlist profiles for the n-gram/stopword language-ID heuristic: tiny
# marker sets per language; prediction = argmax marker-hit ratio
LANG_PROFILES = {
    "en": ["the", "a", "fast", "slow", "small", "big"],
    "fr": ["table", "column", "part", "line"],
    "de": ["hash", "batch", "stream", "window"],
}


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length/word/stopword-ratio quality features per doc."""
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words).cast("long")
    n_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))).cast("long")
    n_distinct = F.size(F.array_distinct(words)).cast("long")
    avg_word_len = F.round(
        (F.length(F.col(text_col)) - (n_words - 1)).cast("double") / n_words, 4
    )
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        F.round(n_stop.cast("double") / n_words, 4).alias("stopword_ratio"),
        F.round(n_distinct.cast("double") / n_words, 4).alias("distinct_ratio"),
        avg_word_len.alias("avg_word_len"),
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (letter runs, digit
    runs, and single non-space symbols counted separately)."""
    ws = F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    bpe = F.regexp_count(F.col(text_col), F.lit(r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]")).cast("long")
    return df.select(F.col(id_col), ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Two fingerprints: content md5 of the normalized text, and a rolling
    polynomial hash (h = h*31 + ascii(first char of token) mod p) — the
    order-sensitive cheap fingerprint."""
    norm = F.lower(F.trim(F.col(text_col)))
    tokens = F.split(norm, " ")
    rolling = F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.ascii(F.substring(t, 1, 1))) % MOD,
    )
    return df.select(
        F.col(id_col),
        F.md5(norm.cast("binary")).alias("content_md5"),
        rolling.alias("rolling_hash"),
    )


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wordlist-profile language ID: score = fraction of tokens hitting each
    profile's marker set; prediction = argmax (ties -> lexicographic)."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words).cast("double")

    def marker_filter(markers: list[str]):
        return lambda w: w.isin(markers)

    scores = {
        lang: F.round(F.size(F.filter(words, marker_filter(markers))).cast("double") / n, 4)
        for lang, markers in LANG_PROFILES.items()
    }
    best = None
    for lang in sorted(LANG_PROFILES):  # lexicographic tie-break: first wins on >=
        cond = None
        for other in sorted(LANG_PROFILES):
            if other == lang:
                continue
            c = (scores[lang] > scores[other]) if other < lang else (scores[lang] >= scores[other])
            cond = c if cond is None else (cond & c)
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    predicted = best.otherwise(F.lit(sorted(LANG_PROFILES)[0]))
    return df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_PROFILES)],
        predicted.alias("predicted_lang"),
    )
