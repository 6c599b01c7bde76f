"""Model-based quality classification for web-text curation.

GPT-3 (Brown et al. 2020, appendix A), LLaMA, and most production corpora
gate documents with a LINEAR classifier over hashed bag-of-ngram features
(fastText architecture: Joulin et al. 2016) trained to separate a clean
reference corpus from raw crawl. Training happens offline; what the 100 TB
pipeline runs is INFERENCE, and that is what this implements — the model
arrives as a (bucket, weight) table, exactly a fastText .bin's input
matrix collapsed to the 1-D decision axis.

Plan shape: features are higher-order column expressions (no Python);
the weight table (dim rows — fastText defaults to 2M buckets, still
broadcast-size) is BROADCAST-joined to the exploded features; the only
exchange carries one partial-aggregated row per document. Scoring is
engine-exact: per-feature weights are 6-dp DECIMAL(25,6) terms summed
exactly, the mean + sigmoid computed in double and rounded — so a SQL
oracle reproduces scores bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import ensure_parallelism


def hashed_features(text: Column, bigrams: bool = True) -> Column:
    """fastText feature set of `text`: lowercase whitespace tokens plus
    (optionally) word bigrams, WITH multiplicity — fastText sums every
    occurrence, so no distinct."""
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    if not bigrams:
        return words
    big = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat(
                F.element_at(words, i + 1), F.lit(" "), F.element_at(words, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(words, big)


def feature_bucket(feat: Column, dim: int) -> Column:
    """Hashing trick: md5-derived uniform bucket in [0, dim)."""
    return F.pmod(
        F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long"), F.lit(dim)
    )


def quality_classifier(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    bias: float = 0.0,
    threshold: float = 0.5,
    bigrams: bool = True,
) -> DataFrame:
    """Score every document with a linear model over hashed bag-of-ngram
    features — fastText inference as a dataflow:

      score(x) = sigmoid(bias + mean_{f in feats(x)} W[h(f) mod dim])

    `weights` is the trained model: (bucket long, weight double); missing
    buckets read as 0. Output (id_col, n_features, score, keep):
    score = round(sigmoid, 6) (null for feature-less docs, which never
    keep); keep = score >= threshold.

    The mean over per-feature weights is the DECIMAL(25,6) exact sum of
    6-dp-rounded weights divided in double — order-independent, hence
    oracle-reproducible at any parallelism."""
    df = ensure_parallelism(df)
    feats = df.select(
        F.col(id_col),
        F.explode(hashed_features(F.col(text_col), bigrams)).alias("_f"),
    ).select(F.col(id_col), feature_bucket(F.col("_f"), dim).alias("bucket"))
    w = weights.select("bucket", F.round("weight", 6).alias("_w"))
    scored = (
        feats.join(F.broadcast(w), "bucket", "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_w"), F.lit(0.0))
            .cast("decimal(25,6)")
            .alias("term"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("term").alias("_s"),
        )
    )
    mean = F.col("_s").cast("double") / F.col("n_features").cast("double")
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(bias) + mean))), 6
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_features"), F.lit(0).cast("long")).alias("n_features"),
            score.alias("score"),
            F.coalesce(score >= F.lit(threshold), F.lit(False)).alias("keep"),
        )
    )
