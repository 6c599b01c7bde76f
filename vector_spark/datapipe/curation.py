"""Composed web-text curation pipeline: the standard public recipe
(Gopher quality gates -> Gopher repetition gates -> cross-document span
dedup -> language ID) as ONE Spark plan.

Mirrors the curation role the reference's transform chains play for logs
(filter -> dedupe -> route), re-expressed for training-data preparation
(reference topology model: src/topology/builder.rs — here the chain is a
single declarative plan instead of connected components).

Scale shape (100 TB): the three row-local stages (quality, repetition,
langid) are FUSED into one projection + filter on the scan — no
self-joins, no extra passes; Catalyst prunes the unused rule columns.
Only dedup_spans shuffles (its two exchanges), and it runs over the
already-gated subset, so the corpus-wide span table is built from
surviving docs only. The final join back to the gated projection is
id-keyed and AQE-planned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_spans
from .text import gopher_quality_exprs, gopher_repetition_exprs


def curation_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality: dict | None = None,
    span_words: int = 3,
    max_removed_frac: float = 0.5,
    languages: list[str] | None = None,
    cache: bool = True,
) -> DataFrame:
    """One doc in -> (doc_id, predicted_lang, n_words, n_spans, n_removed,
    text_dedup) out, for docs that (a) pass the Gopher quality gates
    (`quality` overrides thresholds), (b) pass the Gopher repetition
    gates, and (c) retain at least (1 - max_removed_frac) of their spans
    after corpus-wide span dedup. text_dedup is the deduplicated text.

    Dedup runs AFTER gating (the standard order: don't let junk docs
    claim first occurrence of spans that good docs carry)."""
    from ..session import ensure_parallelism

    df = ensure_parallelism(df)  # interpreted folds + 20 regex scans/row
    # stage the tokenization ONCE: HOFs evaluate interpreted (no codegen
    # subexpression elimination), so a fused filter would otherwise
    # re-split the text once per repetition rule
    wcol = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    staged = df.select(F.col(id_col), F.col(text_col), wcol.alias("_w"))
    q = gopher_quality_exprs(text_col, words=F.col("_w"), **(quality or {}))
    r = gopher_repetition_exprs(text_col, words=F.col("_w"))
    # Gate WITHOUT a Filter node: the gate verdict is a PROJECTED column
    # and gated-out docs are dropped by nulling their text (posexplode of
    # null emits no rows) plus the survivors' inner join. Why no Filter:
    # PushDownPredicate is cost-unaware — it would split the conjunction,
    # substitute `_w` back to the split expression, and push the 9
    # interpreted folds below ensure_parallelism's repartition into the
    # single scan partition (measured 22x slower in r3). Projects are never
    # pushed below exchanges, so no spark_partition_id() barrier hack is
    # needed and the whole subtree stays deterministic.
    flags = staged.select(
        F.col(id_col),
        F.col(text_col),
        q["n_words"].alias("n_words"),
        (q["keep"] & r["keep"]).alias("_keep"),
    ).repartition(F.col(id_col))
    gated = flags.select(
        F.col(id_col),
        F.when(F.col("_keep"), F.col(text_col)).alias(text_col),
        "n_words",
    )
    # `gated` is a DIAMOND: three consumers (dedup_spans' first-occurrence
    # groupBy, its keep-join probe, and the langid meta side). Spark 4.1's
    # AQE was MEASURED here to never fire ReusedExchange even for identical
    # deterministic shuffle subtrees (a minimal diamond repro shows 0
    # reuses; only BroadcastExchange dedupes), so without materialization
    # every consumer re-runs the full 20-regex gate — measured 3x the gate
    # cost at sf0.1. persist(MEMORY_AND_DISK) is the mechanism Spark
    # actually offers for this: the gate evaluates ONCE into the cache and
    # all three subtrees read it. At 100 TB this caches the survivors'
    # (id, text, n_words) projection across executors (disk-backed, the
    # same data a staged production pipeline would write between passes);
    # the id-hash repartition above the gate doubles as the reassembly
    # groupBy's partitioning, so it adds no extra exchange of its own.
    if cache:
        from pyspark import StorageLevel

        gated = gated.persist(StorageLevel.MEMORY_AND_DISK)
    # langid rides only the survivor-metadata side — the span-dedup
    # subtree (evaluated twice: lines + firsts) must not pay for it.
    # Scores stage as attributes before the argmax chain (langid_pick's
    # composition rule — inline, each regex would embed ~40x).
    from .text import _langid_profiles, langid_pick, langid_scores

    langs = sorted(_langid_profiles(languages))
    scores = langid_scores(text_col, languages)
    meta = gated.select(
        F.col(id_col),
        F.col("n_words"),
        *[scores[l].alias(f"_s_{l}") for l in langs],
    ).select(
        F.col(id_col),
        "n_words",
        langid_pick(langs, lambda l: F.col(f"_s_{l}")).alias("predicted_lang"),
    ).select(id_col, "predicted_lang", "n_words")
    spans = dedup_spans(
        gated.select(id_col, text_col), text_col=text_col, id_col=id_col,
        span_words=span_words,
    )
    survivors = spans.filter(
        F.col("n_removed") <= F.lit(max_removed_frac) * F.col("n_spans")
    )
    return survivors.join(meta, id_col).select(
        id_col, "predicted_lang", "n_words", "n_spans", "n_removed", "text_dedup"
    )
