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
from .text import gopher_quality_exprs, gopher_repetition_exprs, langid_exprs


def curation_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality: dict | None = None,
    span_words: int = 3,
    max_removed_frac: float = 0.5,
    languages: list[str] | None = None,
) -> DataFrame:
    """One doc in -> (doc_id, predicted_lang, n_words, n_spans, n_removed,
    text_dedup) out, for docs that (a) pass the Gopher quality gates
    (`quality` overrides thresholds), (b) pass the Gopher repetition
    gates, and (c) retain at least (1 - max_removed_frac) of their spans
    after corpus-wide span dedup. text_dedup is the deduplicated text.

    Dedup runs AFTER gating (the standard order: don't let junk docs
    claim first occurrence of spans that good docs carry)."""
    q = gopher_quality_exprs(text_col, **(quality or {}))
    r = gopher_repetition_exprs(text_col)
    li = langid_exprs(text_col, languages)
    gated = df.filter(q["keep"] & r["keep"]).select(
        F.col(id_col),
        F.col(text_col),
        li["predicted_lang"].alias("predicted_lang"),
        q["n_words"].alias("n_words"),
    )
    spans = dedup_spans(gated, text_col=text_col, id_col=id_col, span_words=span_words)
    survivors = spans.filter(
        F.col("n_removed") <= F.lit(max_removed_frac) * F.col("n_spans")
    )
    return survivors.join(gated.drop(text_col), id_col).select(
        id_col, "predicted_lang", "n_words", "n_spans", "n_removed", "text_dedup"
    )
