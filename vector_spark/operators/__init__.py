from .filter import filter_events
from .route import route, exclusive_route, UNMATCHED
from .dedupe import dedupe
from .sample import sample, sample_group_modulo
from .enrich import enrich_equi, enrich_asof, enrich_between, enrich_constant, enrich_ip_range, enrich_ip6_range, find_table_row, find_enrichment_table_records, get_enrichment_table_record
from .aggregate import (
    aggregate_metrics,
    aggregate_diff,
    aggregate_histogram,
    aggregate_set,
    aggregate_sketch,
    aggregate_summary,
    tumbling_window,
)
from .reduce import reduce_sessions, MERGE_STRATEGIES
from .throttle import throttle
from .log_to_metric import log_to_metric, log_to_metric_all
from .metric_to_log import metric_to_log, metric_to_log_json
from .tag_cardinality_limit import tag_cardinality_limit
from .hash_replace import hash_replace
from .skew import salted_agg
from .remap import remap_with_errors
from .multiline import multiline_agg
from .script import script_transform

__all__ = [
    "filter_events", "route", "exclusive_route", "UNMATCHED", "dedupe",
    "sample", "sample_group_modulo", "enrich_equi", "enrich_asof", "enrich_between", "enrich_constant", "enrich_ip_range", "enrich_ip6_range",
    "find_table_row", "find_enrichment_table_records", "get_enrichment_table_record", "script_transform", "multiline_agg", "aggregate_metrics", "aggregate_diff",
    "aggregate_histogram", "aggregate_set", "aggregate_summary", "aggregate_sketch",
    "tumbling_window", "reduce_sessions", "MERGE_STRATEGIES", "throttle",
    "log_to_metric", "log_to_metric_all", "metric_to_log",
    "metric_to_log_json", "tag_cardinality_limit", "hash_replace",
    "salted_agg", "remap_with_errors",
]
