"""Crawl -> corpus pipeline: the web-text twin of pages_pipeline.

Where pages_pipeline is the north-rule LOG topology (parse -> enrich ->
route -> aggregate over already-structured pages), this is the TRAINING-
DATA topology over raw crawl archives: WARC records in, curated corpus +
rejection routes + per-route rollups out. Same reference lineage —
remap/parse (src/transforms/remap.rs), exclusive route
(src/transforms/route.rs first-match-wins), aggregate — re-expressed as
one declarative Spark plan over the round-3 web-text operators:

  frame    = frame_warc (Content-Length byte-walk; Arrow-batched,
             per-archive parallel — a 100 TB crawl is millions of
             independent WARC buffers).
  parse    = parse_warc_record (pure regexp header struct) +
             html_text_expr for 'response' records ('conversion'
             records — WET extracts — pass payload through verbatim).
  gate     = Gopher quality exprs + trigram langid, FUSED into the same
             projection (curation_pipeline's single-scan discipline);
             the gates become a ROUTE column, not a filter, so nothing
             is dropped before the rollup and there is no predicate to
             mis-push below the exchange.
  route    = first-match-wins: rejected_quality -> rejected_lang ->
             corpus (exclusive_route semantics as a when-chain).
  aggregate= per (route, predicted_lang) doc/word counts — two-phase
             map-side partials, one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datapipe.html import html_text_expr
from ..datapipe.text import (
    _langid_profiles,
    gopher_quality_exprs,
    langid_pick,
    langid_scores,
)
from ..functions.parse import frame_warc, parse_warc_record

CRAWL_ROUTES = ("rejected_quality", "rejected_lang", "corpus")


def crawl_pipeline(
    warc: DataFrame,
    buf_col: str = "buf",
    target_langs: tuple[str, ...] = ("en",),
    languages: list[str] | None = None,
    quality: dict | None = None,
) -> dict[str, DataFrame]:
    """WARC buffers -> {"records": parsed records, "curated": per-doc route
    assignment with text/lang/stats, "route_counts": per (route, lang)
    rollup}.

    `target_langs` drives the rejected_lang route; `languages` restricts
    the langid profile set (cost: one regexp_count per profile per doc);
    `quality` overrides the Gopher thresholds."""
    from ..session import ensure_parallelism

    def _once(c):
        # CollapseProject inlines derived columns into EVERY downstream
        # expression — unguarded, this plan measured 461 KB of physical
        # tree with 1531 duplicated regexp_extracts and codegen bailing
        # out entirely. The spark_partition_id() guard (always true, the
        # curation_pipeline trick) marks the column nondeterministic, so
        # the projection computing it is a barrier: parsed struct,
        # extracted text, and tokenization each evaluate ONCE per row.
        return F.when(F.spark_partition_id() >= 0, c)

    warc = ensure_parallelism(warc)  # Arrow framing + 20+ regex scans/row
    recs = warc.select(
        F.posexplode(frame_warc(F.col(buf_col))).alias("rec_idx", "_rec")
    ).select("rec_idx", _once(parse_warc_record(F.col("_rec"))).alias("w"))
    records = recs.select("rec_idx", "w.*")

    text = F.when(
        F.col("warc_type") == "response", html_text_expr(F.col("payload"))
    ).otherwise(F.col("payload"))
    pages = records.filter(
        F.col("warc_type").isin("response", "conversion")
    ).select(
        "target_uri",
        "warc_date",
        "content_length",
        _once(text).alias("text"),
    )

    # stage tokenization once (HOF folds don't codegen-share; see
    # curation_pipeline), fuse quality + langid SCORES into one
    # projection, then pick/route over the staged attributes
    # (langid_pick's composition rule)
    wcol = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    staged = pages.select("*", _once(wcol).alias("_w"))
    q = gopher_quality_exprs("text", words=F.col("_w"), **(quality or {}))
    langs = sorted(_langid_profiles(languages))
    scores = langid_scores("text", languages)
    scored = staged.select(
        "target_uri",
        "warc_date",
        "content_length",
        "text",
        q["n_words"].alias("n_words"),
        q["keep"].alias("_keep"),
        *[scores[l].alias(f"_s_{l}") for l in langs],
    ).select(
        "target_uri",
        "warc_date",
        "content_length",
        "text",
        "n_words",
        "_keep",
        langid_pick(langs, lambda l: F.col(f"_s_{l}")).alias("predicted_lang"),
    )
    route = (
        F.when(~F.col("_keep"), F.lit("rejected_quality"))
        .when(~F.col("predicted_lang").isin(*target_langs), F.lit("rejected_lang"))
        .otherwise(F.lit("corpus"))
    )
    curated = scored.select(
        "target_uri",
        "warc_date",
        "content_length",
        "n_words",
        "predicted_lang",
        route.alias("route"),
        "text",
    )

    route_counts = curated.groupBy("route", "predicted_lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_words").alias("words"),
    )
    return {"records": records, "curated": curated, "route_counts": route_counts}
