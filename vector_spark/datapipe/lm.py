"""Statistical-LM quality scoring for web-text curation (CCNet-style).

CCNet (Wenzek et al. 2020) scores every document's perplexity under a
KenLM 5-gram model and keeps the low-perplexity "head" of the
distribution. KenLM isn't available in-sandbox (and a 5-gram model is an
artifact, not code), so this implements the same pipeline shape with a
self-trained UNIGRAM model — honestly disclosed; swapping in a real LM
changes only the `term` expression, not the plan:

  1. train: token counts over the corpus — one shuffle keyed by word,
     map-side combined, so the exchange is bounded by vocabulary size
     (millions of rows at 100 TB), not token count. The result is
     broadcast.
  2. score: explode doc tokens, broadcast-hash-join the model (no
     shuffle), per-token Laplace log10-prob, partial-aggregate per doc —
     the only exchange carries ONE row per document.
  3. bucket: head / middle / tail against caller thresholds (CCNet cuts
     at corpus percentiles; thresholds arrive as literals so the plan
     stays a pure two-pass dataflow — compute them however you like).

Engine-exactness: per-token terms are log10 differences of INTEGER-valued
doubles rounded to 6 dp, summed as DECIMAL(25,6) (exact, order-
independent — the float-sum house rule), then averaged in double and
rounded to 4 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token -> count over the corpus. One word-keyed exchange, bounded by
    vocabulary (map-side partial agg collapses repeats per partition)."""
    return (
        df.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def perplexity_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm: DataFrame | None = None,
    head: float = 2.0,
    middle: float = 2.3,
) -> DataFrame:
    """Per-document mean negative log10-probability under a unigram model
    with Laplace smoothing — p(w) = (c_w + 1) / (T + V) — plus the CCNet
    head/middle/tail bucket:

      n_words — tokens in the doc
      nll     — round(-(sum_w round(log10(c_w+1) - log10(T+V), 6)) / n, 4)
                (lower = more "in-distribution"; empty docs -> null)
      bucket  — 'head' if nll <= head, 'middle' if <= middle, else 'tail'

    `lm` defaults to self-training on `df` (the usual curation setup
    scores a dirty corpus under a clean-corpus model — pass that model's
    counts here; the plan is identical)."""
    from ..session import ensure_parallelism

    df = ensure_parallelism(df)
    if lm is None:
        lm = unigram_lm(df, text_col)
    totals = lm.agg(
        F.sum("cnt").cast("long").alias("_t"), F.count(F.lit(1)).cast("long").alias("_v")
    )
    toks = df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("w"))
    scored = (
        toks.join(F.broadcast(lm), "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.round(
                F.log10(F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(1.0))
                - F.log10((F.col("_t") + F.col("_v")).cast("double")),
                6,
            )
            .cast("decimal(25,6)")
            .alias("term"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("term").alias("_s"),
        )
    )
    nll = F.round(-(F.col("_s").cast("double")) / F.col("n_words").cast("double"), 4)
    base = df.select(F.col(id_col))
    return (
        base.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias("n_words"),
            nll.alias("nll"),
            F.when(nll.isNull(), F.lit(None).cast("string"))
            .when(nll <= head, F.lit("head"))
            .when(nll <= middle, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
