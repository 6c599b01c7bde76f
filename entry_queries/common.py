"""Shared imports/helpers for the driver-contract query modules
(split from the former monolithic __spark_entry__.py; see that file
for the engine-portability rules that apply to every entry)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import broadcast

from vector_spark.operators import (
    dedupe,
    enrich_between,
    enrich_equi,
    exclusive_route,
    filter_events,
    hash_replace,
    log_to_metric,
    metric_to_log,
    reduce_sessions,
    sample,
    tag_cardinality_limit,
    throttle,
)
from vector_spark.operators.aggregate import aggregate_metrics, tumbling_window
from vector_spark.operators.log_to_metric import MetricSpec
from vector_spark.operators.route import routed_union
from vector_spark.datapipe import (
    binary_meta,
    cosine_topk,
    doc_fingerprint,
    exact_dedup,
    langid,
    lsh_ann_topk,
    minhash_lsh_pairs,
    simhash,
    text_quality,
    token_count,
)
from vector_spark.sources import generate_pages, geo_dim, lang_dim
from vector_spark.plans import pages_pipeline


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver may run these on its own session: pin the tz-sensitive
    # confs (unix_timestamp over NTZ values, decode of raw bytes) so
    # results match the tz-agnostic DuckDB oracles regardless of host tz
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(col, alias: str):
    """Engine-exact float sum: per-row cast to DECIMAL(25,6) (deterministic
    rounding of the double), exact decimal sum, cast back to double."""
    return F.sum(col.cast("decimal(25,6)")).cast("double").alias(alias)


DSUM_SQL = "CAST(sum(CAST({col} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"

ROUTES = {
    "errors": "event_type = 'error'",
    "high_value": "value > 150",
    "signup": "event_type = 'signup'",
}


# --------------------------------------------------------------------------
# query implementations (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


_BP_NAV = '<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>'
_BP_LEAD = (
    "the quick summary of it is that this page was written for you and "
    "we have put it on the web as the content you are here for "
)
_BP_TAIL = (
    '<p>Read more</p><div>Copyright 2020 <a href="/t">Terms</a> '
    '<a href="/p">Privacy</a><script>var x = 1;</script></div>'
)


