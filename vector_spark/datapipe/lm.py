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


def importance_weights(
    df: DataFrame,
    target_lm: DataFrame,
    source_lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-doc log importance
    ratio under two unigram models,

      log w(x) = sum_tokens [ log p_target(tok) - log p_source(tok) ]

    with Laplace smoothing on both sides (DSIR's hashed-ngram features
    reduce to unigram counts at n=1; log10 instead of ln scales every
    weight by the constant 1/ln 10 — absorbed by the sampler's
    temperature, disclosed here). `source_lm` defaults to self-training
    on `df` (the standard setup: raw-corpus source vs curated target).

    Output: (id_col, n_words, log_ratio) — log_ratio is the engine-exact
    DECIMAL(25,6) sum of 6-dp-rounded per-token terms cast to double;
    docs with no tokens get null. Plan: both LMs broadcast, the only
    exchange carries one row per doc (the perplexity_score shape)."""
    from ..session import ensure_parallelism

    df = ensure_parallelism(df)
    if source_lm is None:
        source_lm = unigram_lm(df, text_col)
    t_tot = target_lm.agg(
        F.sum("cnt").cast("long").alias("_tt"), F.count(F.lit(1)).cast("long").alias("_tv")
    )
    s_tot = source_lm.agg(
        F.sum("cnt").cast("long").alias("_st"), F.count(F.lit(1)).cast("long").alias("_sv")
    )
    toks = df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("w"))
    lp = lambda c, tot: F.log10(
        F.coalesce(c, F.lit(0)).cast("double") + F.lit(1.0)
    ) - F.log10(tot.cast("double"))
    scored = (
        toks.join(F.broadcast(target_lm.select("w", F.col("cnt").alias("_tc"))), "w", "left")
        .join(F.broadcast(source_lm.select("w", F.col("cnt").alias("_sc"))), "w", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(s_tot))
        .select(
            F.col(id_col),
            F.round(
                lp(F.col("_tc"), F.col("_tt") + F.col("_tv"))
                - lp(F.col("_sc"), F.col("_st") + F.col("_sv")),
                6,
            )
            .cast("decimal(25,6)")
            .alias("term"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("term").cast("double").alias("log_ratio"),
        )
    )
    return df.select(F.col(id_col)).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias("n_words"),
        F.col("log_ratio"),
    )


def importance_resample(
    df: DataFrame,
    k: int,
    target_lm: DataFrame,
    source_lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    seed: str = "dsir",
) -> DataFrame:
    """DSIR's sampling step: Gumbel-top-k over the importance weights —
    equivalent to drawing k docs without replacement with probability
    proportional to exp(log_ratio / temperature) — made REPLAYABLE with
    md5-derived uniforms (the seeded-random house pattern): any executor
    count, any partitioning, both engines pick the same k docs.

      u    = (first-8-hex(md5(seed|id)) + 0.5) / 2^32      in (0,1)
      key  = round(log_ratio / temperature - ln(-ln(u)), 6)
      take top-k by (key desc, id)  — round + unique-id tie-break rule

    Token-less docs (null log_ratio) never sample. Top-k is sort+limit:
    per-partition top-k then a k-row merge on the driver side of the
    exchange — no full sort of the corpus at 100 TB."""
    from ..functions.strings import _rand_bits

    w = importance_weights(df, target_lm, source_lm, text_col, id_col)
    u = (
        _rand_bits(F.col(id_col), seed).cast("double") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col("log_ratio") / F.lit(temperature) + gumbel, 6)
    return (
        w.filter(F.col("log_ratio").isNotNull())
        .select(
            id_col,
            "n_words",
            F.round("log_ratio", 4).alias("log_ratio"),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), id_col)
        .limit(k)
    )


def bigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram counts over the corpus with a `<s>` begin-of-document
    sentinel context for each document's first token: (prev, w) -> cnt.

    Plan: the pair stream is built in-row (one `transform` over the token
    array — no self-join, no lag window), then ONE exchange keyed by
    (prev, w) with map-side partial aggregation, so the shuffle is bounded
    by the distinct-bigram vocabulary (KenLM's model size), never the
    corpus token count. The `<s>` sentinel is lowercase-proof (tokens are
    lowercased, the sentinel is not a lowercase word boundary collision
    risk for natural text; disclosed)."""
    d = df.select(_tokens(F.col(text_col)).alias("_ws")).filter(F.size("_ws") > 0)
    pairs = d.select(
        F.explode(
            F.expr(
                "transform(_ws, (x, i) -> struct("
                "CASE WHEN i = 0 THEN '<s>' ELSE _ws[i-1] END AS prev, x AS w))"
            )
        ).alias("p")
    ).select("p.prev", "p.w")
    return pairs.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("cnt"))


def kn_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm: DataFrame | None = None,
    discount: float = 0.75,
    head: float = 2.0,
    middle: float = 2.3,
) -> DataFrame:
    """Per-document perplexity under an INTERPOLATED KNESER-NEY bigram
    model — the actual smoothing family KenLM implements (Kneser & Ney
    1995; Chen & Goodman 1999 eq. 4.26), upgrading perplexity_score's
    disclosed unigram analogue to a real conditional LM:

      p(w|prev) = max(c(prev,w) - D, 0) / c(prev)
                  + D * N1+(prev,*) / c(prev) * p_cont(w)
      p_cont(w) = (N1+(*,w) + 1) / (B + V)     (Laplace floor so OOV
                                                tokens score finitely;
                                                disclosed deviation from
                                                the unsmoothed KN lower
                                                order)
      unseen context: p(w|prev) = p_cont(w)

    where D = `discount` (KenLM's default absolute discount family; 0.75
    is binary-exact so both engines see the identical double), c(prev) is
    the context token count, N1+(prev,*) the distinct continuations of
    `prev`, N1+(*,w) the distinct left-contexts of `w`, B the distinct
    bigram count and V the continuation vocabulary. Every document's
    first token is conditioned on the `<s>` sentinel (trained the same
    way by bigram_lm).

    Output: (id_col, n_words, nll, bucket) — the perplexity_score shape:
    nll = round(-(DECIMAL-exact sum of 6-dp-rounded log10 p terms)/n, 4),
    CCNet head/middle/tail buckets against caller thresholds.

    100 TB plan: the four model tables (bigrams + the three aggregations
    OF the bigram table) are vocabulary-bounded and broadcast; the token
    stream never shuffles — the only corpus-sized exchange carries ONE
    row per document (the partial-agg per-doc sum). Engine-exactness:
    p is a single fixed expression tree over integer counts and the
    binary-exact discount, evaluated identically in the DuckDB oracle;
    log10 at 6-dp rounding is the proven-safe house rule."""
    from ..session import ensure_parallelism

    df = ensure_parallelism(df)
    if lm is None:
        lm = bigram_lm(df, text_col)
    ctx = lm.groupBy("prev").agg(
        F.sum("cnt").cast("long").alias("_cp"),
        F.count(F.lit(1)).cast("long").alias("_nr"),
    )
    cont = lm.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("_nl"))
    totals = lm.agg(
        F.count(F.lit(1)).cast("long").alias("_b"),
        F.count_distinct("w").cast("long").alias("_v"),
    )
    d = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_ws"))
    pairs = d.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(_ws, (x, i) -> struct("
                "CASE WHEN i = 0 THEN '<s>' ELSE _ws[i-1] END AS prev, x AS w))"
            )
        ).alias("p"),
    ).select(id_col, "p.prev", "p.w")
    dd = F.lit(float(discount))
    p_cont = (F.coalesce(F.col("_nl"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("_b") + F.col("_v")
    ).cast("double")
    p_seen = (
        F.greatest(F.col("cnt").cast("double") - dd, F.lit(0.0))
        / F.col("_cp").cast("double")
    ) + (dd * F.col("_nr").cast("double") / F.col("_cp").cast("double")) * p_cont
    p = F.when(F.col("_cp").isNotNull(), p_seen).otherwise(p_cont)
    scored = (
        pairs.join(F.broadcast(lm), ["prev", "w"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .join(F.broadcast(cont), "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.round(F.log10(p), 6).cast("decimal(25,6)").alias("term"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("term").alias("_s"),
        )
    )
    nll = F.round(-(F.col("_s").cast("double")) / F.col("n_words").cast("double"), 4)
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
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
