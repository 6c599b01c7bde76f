"""Driver contract for the spark-graft builder (PySpark target).

Thin aggregator over the `entry_queries/` family modules (transforms, tpch,
datapipe, vrl_codecs — split per VERDICT_r3 item 8); each module pairs its
Spark `QUERIES` with its DuckDB `oracles()` so the identical-alias rule is
enforced side by side.

Every operator from SURVEY.md §2 that is implemented gets a `queries()`
entry (Spark, via vector_spark operators) and — where ANSI-SQL-expressible —
an `oracle_sql()` entry (DuckDB, same parquet views). Engine-portability
rules used throughout so the value-hash compare is exact:

  * no raw timestamps in outputs — epoch micros/seconds as BIGINT
    (unix_micros <-> epoch_us, both integer-exact);
  * float sums go through DECIMAL(25,6) (exact associative sum) and back to
    DOUBLE, so Spark's unordered partial aggregation and DuckDB's sequential
    sum produce bit-identical results;
  * hashes are md5-of-identical-strings (same hex in both engines);
  * every rank/top-k orders by (rounded value, unique id) — no float-order
    ambiguity;
  * aliases identical on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from entry_queries import datapipe, tpch, transforms, vrl_codecs

_MODULES = (transforms, tpch, datapipe, vrl_codecs)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return transforms.q_pipeline_events_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        dup = set(out) & set(m.QUERIES)
        if dup:
            raise ValueError(f"duplicate contract query names: {sorted(dup)}")
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        sql = m.oracles()
        dup = set(out) & set(sql)
        if dup:
            raise ValueError(f"duplicate oracle names: {sorted(dup)}")
        out.update(sql)
    return out
