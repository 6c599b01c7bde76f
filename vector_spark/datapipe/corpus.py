"""Corpus-assembly operations for training-data pipelines: benchmark
decontamination and deterministic corpus shuffling.

These have no reference-engine counterpart (Vector is an event pipeline);
they are the corpus-level ops a 100 TB web-text curation run needs after
filtering/dedup, built shuffle-disciplined:

  * decontaminate  — GPT-3-style n-gram overlap decontamination against a
                     held-out benchmark table. The benchmark n-gram set is
                     tiny (benchmarks are MBs) and is BROADCAST; the only
                     shuffled rows are (doc_id, matched-gram) hits, which
                     the partial agg collapses to one row per contaminated
                     doc before the exchange.
  * shuffle_corpus — seed-deterministic global reshuffle into n_shards
                     output shards (the training-data "global shuffle"
                     step): ONE exchange keyed by the md5-derived shard,
                     in-shard order by the same hash. Size n_shards so a
                     shard fits an output file (~1 GB): at 100 TB that is
                     ~10^5 shards, far above any executor count, so the
                     exchange is balanced by construction.

Engine-portable (md5 as the hash family) so a SQL oracle reproduces both
bit-for-bit; no Python anywhere — n-gram construction is higher-order
column functions, hashing/ranking are built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_ngrams(text: Column, n: int) -> Column:
    """Distinct lowercase word-n-grams of `text` (whitespace tokens,
    space-joined), as an array<string>; empty when the doc has < n words."""
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    return F.array_distinct(
        F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - n),
                lambda i: F.array_join(F.slice(words, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    max_frac: float = 0.0,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Flag training documents that overlap a held-out benchmark/eval set
    on word n-grams (the GPT-3 appendix-C decontamination rule; 13-grams
    are the published default). Output per input doc:

      n_grams     — distinct n-grams in the doc (0 if < n words)
      n_hits      — of those, how many appear anywhere in the benchmark
      contam_frac — n_hits / max(n_grams, 1), rounded to 4 dp
      keep        — contam_frac <= max_frac (default 0.0: ANY collision
                    drops, the conservative published setting)

    Plan shape for 100 TB: the benchmark's distinct-gram set is built once
    (benchmark tables are small — broadcast), the doc side's exploded
    grams hash-join against it WITHOUT shuffling (broadcast join), the
    surviving hit rows partial-aggregate per doc before the single
    exchange, and the final left join carries only (id, n_grams) — ids,
    never text."""
    from ..session import ensure_parallelism

    tcol = bench_text_col or text_col
    df = ensure_parallelism(df)  # interpreted n-gram folds: spread the scan
    bench_grams = (
        benchmark.select(F.explode(_word_ngrams(F.col(tcol), n)).alias("g")).distinct()
    )
    stats = df.select(
        F.col(id_col), F.size(_word_ngrams(F.col(text_col), n)).cast("long").alias("n_grams")
    )
    hits = (
        df.select(F.col(id_col), F.explode(_word_ngrams(F.col(text_col), n)).alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    frac = F.round(
        F.col("n_hits").cast("double") / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
        4,
    )
    return (
        stats.join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)).cast("long"))
        .select(
            id_col,
            "n_grams",
            "n_hits",
            frac.alias("contam_frac"),
            (frac <= F.lit(max_frac)).alias("keep"),
        )
    )


def shuffle_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic global corpus shuffle: every row gets a stable
    (shard, pos) from md5(seed || id) — shard = first-8-hex-digits mod
    n_shards, pos = 1-based rank within the shard by (hash, id). Identical
    output for any input partitioning or cluster size (the property a
    resumable training-data job needs: re-running the shuffle after a
    failure reproduces the same shard files byte-for-byte).

    ONE exchange (the window's partitionBy) + an in-shard sort — the
    minimum any global shuffle pays. Rank is computed per shard, so skew
    is bounded by the hash's uniformity; size n_shards to output-file
    granularity, not executor count."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).alias("shard")
    keep = [F.col(id_col)] + [F.col(c) for c in (payload_cols or [])]
    staged = df.select(*keep, shard, h.alias("_h"))
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return staged.withColumn("pos", F.row_number().over(w).cast("long")).drop("_h")


def split_corpus(
    df: DataFrame,
    val_frac: float = 0.05,
    group_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    granularity: int = 1_000_000,
) -> DataFrame:
    """Leakage-aware train/validation split. Every row gets a stable
    `split` label ('train'/'val') from md5(seed || key) — deterministic at
    any parallelism, resumable, and GROUP-DISJOINT when `group_col` is
    given: all rows sharing the group (a url host, a `source`, or — the
    strongest guard — a dedup cluster_id from dedup_clusters) land on the
    SAME side, so near-duplicates can never straddle the split and leak
    eval text into training. With group_col=None the key is the content
    hash, which at least keeps exact duplicates on one side.

    val iff (first-8-hex of md5) mod granularity < val_frac*granularity —
    the same prefix-mod arithmetic as shuffle_corpus, so an oracle
    reproduces it bit-for-bit.

    Scale: a narrow projection — zero shuffles, zero lookups; the split of
    a 10^12-row corpus costs one scan."""
    key = (
        F.col(group_col).cast("string")
        if group_col is not None
        else F.md5(F.col(text_col).cast("binary"))
    )
    # strict concat (NOT concat_ws): a NULL key must propagate so a null
    # group lands on the deterministic 'train' fallback on BOTH engines
    # (SQL '...' || NULL is NULL -> CASE falls through), instead of
    # silently hashing the bare seed as one pseudo-group
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key)), 1, 8), 16, 10
    ).cast("long")
    cut = int(val_frac * granularity)
    split = F.when((h % granularity) < cut, F.lit("val")).otherwise(F.lit("train"))
    return df.withColumn("split", split)


def mixture_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Token-budget mixture sampling — the "data mixing" step that cuts
    each corpus stratum (language, source, domain) down to a target token
    budget: a doc is kept iff the running token total up to and including
    it — in the seed-deterministic md5 order — stays within the group's
    budget (prefix-sum cut: the first doc to cross the budget, and
    everything after it in the order, is dropped); groups absent from
    `budgets` are dropped entirely. Deterministic at any parallelism, so
    the SQL oracle replays the draw exactly.

    Scale shape (the point of this implementation): the naive form is a
    per-group running-sum window — one sort task per group, so a hot
    group (at 100 TB, 'en' is most of the corpus) serializes into a
    single straggler. Instead the prefix sum is computed hierarchically:

      1. bucket every doc by its hash's first 2 hex digits (256 buckets),
      2. per-(group, bucket) token totals — a map-side-combined agg whose
         output is ≤ 256 rows per group; the bucket-prefix window runs
         over THAT (trivial, skew-free),
      3. buckets entirely under the budget keep all their docs with NO
         per-row sort; buckets entirely past it drop all theirs; only the
         ONE boundary bucket per group pays a fine-grained running-sum
         window, over 1/256th of the group.

    Both passes move only (id, group, n_tokens, hash) — never text.
    Returns (id_col, group_col, n_tokens) for the kept docs; n_tokens is
    the whitespace token count (the curation-standard proxy — point
    text_col at a pre-tokenized rendering to use a real tokenizer)."""
    from pyspark.sql import Window

    budget_map = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    h = F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string")))
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    ).cast("long")
    scored = df.select(
        F.col(id_col),
        F.col(group_col),
        n_tokens.alias("n_tokens"),
        h.alias("_h"),
        F.substring(h, 1, 2).alias("_bk"),
        F.element_at(budget_map, F.col(group_col)).cast("long").alias("_budget"),
    ).filter(F.col("_budget").isNotNull())
    btot = scored.groupBy(group_col, "_bk").agg(F.sum("n_tokens").alias("_bt"))
    wb = Window.partitionBy(group_col).orderBy("_bk")
    bpre = btot.withColumn("_bpre", F.sum("_bt").over(wb) - F.col("_bt"))
    joined = scored.join(F.broadcast(bpre), [group_col, "_bk"])
    out_cols = [id_col, group_col, "n_tokens"]
    whole = joined.filter(F.col("_bpre") + F.col("_bt") <= F.col("_budget"))
    boundary = joined.filter(
        (F.col("_bpre") + F.col("_bt") > F.col("_budget"))
        & (F.col("_bpre") < F.col("_budget"))
    )
    wf = (
        Window.partitionBy(group_col, "_bk")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fine = boundary.withColumn(
        "_cum", F.col("_bpre") + F.sum("n_tokens").over(wf)
    ).filter(F.col("_cum") <= F.col("_budget"))
    return whole.select(*out_cols).union(fine.select(*out_cols))



def temperature_budgets(
    df: DataFrame,
    total_tokens: int,
    temperature: float = 1.0,
    group_col: str = "lang",
    text_col: str = "text",
) -> dict[str, int]:
    """Per-group token budgets for `mixture_sample` from TEMPERATURE
    sampling — the multilingual-LM data-mixing recipe (p_g proportional to
    n_g^(1/T): T=1 keeps natural proportions, larger T flattens toward
    uniform, upweighting low-resource groups; published in the XLM-R /
    mT5 data recipes).

    Cross-engine exact by construction so an oracle can replay the cut:
    each group's weight is the INTEGER round(exp(ln(n_g)/T) * 1e6)
    (micro-units — the repo's rounded-6 float contract), and the budget is
    pure integer math from there: budget_g = total_tokens * w_g // sum(w).
    Driver-side collect of one row per group is bounded by the number of
    groups (languages/sources — dozens, not data-scale); the token totals
    themselves come from ONE map-side-combined aggregation."""
    import math

    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    ).cast("long")
    totals = {
        r["g"]: r["n"]
        for r in df.select(
            F.col(group_col).alias("g"), n_tokens.alias("n")
        )
        .groupBy("g")
        .agg(F.sum("n").alias("n"))
        .collect()
        if r["g"] is not None and r["n"]
    }
    # half-away-from-zero, matching DuckDB/Spark round() — Python round()
    # is half-even, the one rounding mode the repo's contract excludes
    weights = {
        g: math.floor(math.exp(math.log(n) / temperature) * 1_000_000 + 0.5)
        for g, n in totals.items()
    }
    w_sum = sum(weights.values())
    return {
        g: total_tokens * w // w_sum for g, w in sorted(weights.items())
    }

def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
    append_eos: bool = True,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """GPT-style sequence packing — concatenate the corpus in the
    shuffle_corpus order (same seed -> same order) and chunk the token
    stream into fixed `seq_len` training sequences; documents spanning a
    boundary are split across sequences. This is the classic
    concatenate-and-chunk LM data layout (GPT-2/3): zero padding waste,
    deterministic, and resumable (re-running reproduces identical
    sequence assignments on any cluster size).

    Returns one row per (document x sequence it overlaps):
      (shard, seq_no, doc_id, doc_offset, seq_offset, n_tokens)
    where seq_no is shard-local (global id = (shard, seq_no)),
    doc_offset/seq_offset are the token offsets of the contributed slice
    inside the doc / the sequence, and n_tokens is the slice length.
    append_eos reserves one separator token after every document (the
    usual <|endoftext|> convention), so even empty docs occupy a slot.

    Scale shape: ONE exchange (the per-shard cumsum window) + a narrow
    span explode. The window serializes per shard, so shard count is the
    parallelism knob — size n_shards to ~file granularity (10^5 at
    100 TB), never executor count; token counting and span arithmetic
    are scan-speed expressions."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    # token counting: whitespace words by default, or a precomputed
    # tokenizer-exact count column (e.g. size(bpe_encode(...).tokens) —
    # makes packing/budgets token-exact rather than regex-approximate)
    base_count = (
        F.col(n_tokens_col)
        if n_tokens_col is not None
        else F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""))
    )
    n_tok = (base_count + (1 if append_eos else 0)).cast("long")
    staged = df.select(
        F.col(id_col), shard.alias("shard"), h.alias("_h"), n_tok.alias("_n")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = staged.withColumn("_end", F.sum("_n").over(w)).withColumn(
        "_start", F.col("_end") - F.col("_n")
    )
    L = F.lit(seq_len).cast("long")
    spans = F.when(
        F.col("_end") > F.col("_start"),
        F.sequence(
            F.floor(F.col("_start") / L).cast("long"),
            F.floor((F.col("_end") - 1) / L).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    ex = c.select(
        id_col, "shard", "_start", "_end", F.explode(spans).alias("seq_no")
    )
    cs = F.greatest(F.col("_start"), F.col("seq_no") * L)
    ce = F.least(F.col("_end"), (F.col("seq_no") + 1) * L)
    return ex.select(
        "shard",
        "seq_no",
        F.col(id_col),
        (cs - F.col("_start")).alias("doc_offset"),
        (cs - F.col("seq_no") * L).alias("seq_offset"),
        (ce - cs).alias("n_tokens"),
    )


def corpus_build(
    df: DataFrame,
    weights: DataFrame,
    budgets: dict[str, int],
    seq_len: int = 64,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """The composed end-to-end training-corpus build — the workflow a
    100 TB curation run actually executes, as ONE dataflow:

      exact dedup -> model-based quality gate (quality_classifier) ->
      per-group token-budget mixture (mixture_sample) ->
      training-sequence packing (pack_sequences)

    Each stage's survivor set flows forward as an ids-only LEFT SEMI
    join against the doc table — text is re-read from the (pruned) scan,
    never carried through a stage's shuffle. The SQL oracle is the same
    composition with each stage's oracle re-rooted onto the previous
    stage's survivors, so the whole pipeline is hash-exact end to end."""
    from .classifier import quality_classifier
    from .dedup import exact_dedup

    surv = df.join(
        exact_dedup(df, text_col, id_col).select(F.col("keep_id").alias(id_col)),
        id_col,
        "left_semi",
    )
    kept_ids = (
        quality_classifier(surv, weights, text_col, id_col, threshold=threshold)
        .filter(F.col("keep"))
        .select(id_col)
    )
    kept = surv.join(kept_ids, id_col, "left_semi")
    mixed_ids = mixture_sample(kept, budgets, group_col, text_col, id_col).select(id_col)
    sampled = kept.join(mixed_ids, id_col, "left_semi")
    return pack_sequences(sampled, seq_len, text_col, id_col)


def dataset_build(
    df: DataFrame,
    merges: list[tuple[str, str]],
    k: int = 8,
    val_frac: float = 0.25,
    group_col: str = "source",
    seq_len: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The round-4 composed TRAINING-DATASET build — the post-curation
    tail of a 100 TB pipeline as ONE dataflow:

      exact-substring dedup (Lee et al. duplicated-k-gram coverage) ->
      leakage-aware GROUP-disjoint train/val split (split_corpus) ->
      tokenizer-exact BPE token counts (bpe_encode) ->
      train-side GPT-style sequence packing (pack_sequences)

    Complements corpus_build (which covers dedup->classify->mix->pack):
    here the packing arithmetic runs on REAL subword counts of the
    substring-DEDUPED text, and the split is group-disjoint so val text
    can never leak into the packed training shards.

    Scale shape: dedup_substrings' three narrow exchanges; the split is a
    zero-shuffle projection; bpe_encode is a zero-shuffle Arrow walk; the
    packing cumsum is one ids+counts-only exchange. Deduped text crosses
    exactly one shuffle (the dedup reassembly) and never another."""
    from .bpe import bpe_encode
    from .dedup import dedup_substrings

    dd = dedup_substrings(df, text_col=text_col, id_col=id_col, k=k)
    base = dd.join(df.select(id_col, group_col), id_col)
    sp = split_corpus(
        base, val_frac=val_frac, group_col=group_col,
        text_col="text_dedup", id_col=id_col,
    )
    train = sp.filter(F.col("split") == "train")
    enc = bpe_encode(train, merges, text_col="text_dedup").withColumn(
        "_nb", F.size("tokens").cast("long")
    )
    return pack_sequences(
        enc.select(id_col, "_nb"), seq_len=seq_len, id_col=id_col,
        n_tokens_col="_nb",
    )
