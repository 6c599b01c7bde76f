"""dedupe + sample semantics — mirrors reference tests
(src/transforms/dedupe/config.rs:71+ match/ignore paths,
src/transforms/sample/tests.rs determinism)."""

import pytest
from pyspark.sql import functions as F

from vector_spark.operators import dedupe, sample

from conftest import rows


def _dups(spark):
    return spark.createDataFrame(
        [
            (1, "h1", "boot"),
            (2, "h1", "boot"),   # dup of 1
            (3, "h2", "boot"),   # different host -> kept
            (4, "h1", "crash"),
            (60, "h1", "boot"),  # repeat of 1/2, far away in order
        ],
        "event_id long, host string, message string",
    )


def test_dedupe_first_keeps_first_occurrence(spark):
    out = dedupe(_dups(spark), match=["host", "message"], order_by="event_id")
    assert rows(out, "event_id") == [(1,), (3,), (4,)]


def test_dedupe_ignore_complement(spark):
    # ignore=[event_id] -> key is all other fields
    out = dedupe(_dups(spark), ignore=["event_id"], order_by="event_id")
    assert rows(out, "event_id") == [(1,), (3,), (4,)]


def test_dedupe_match_and_ignore_mutually_exclusive(spark):
    with pytest.raises(ValueError):
        dedupe(_dups(spark), match=["host"], ignore=["message"])


def test_dedupe_lru_window_eviction(spark):
    # window 50: event 2 (distance 1 from 1) dropped; event 60 (distance 58
    # from 2) survives — the bounded-cache eviction behavior
    out = dedupe(_dups(spark), match=["host", "message"], order_by="event_id", lru_window=50)
    assert rows(out, "event_id") == [(1,), (3,), (4,), (60,)]


def test_dedupe_any_representative(spark):
    out = dedupe(_dups(spark), match=["host", "message"], keep="any")
    assert out.count() == 3


def test_sample_deterministic_and_stamped(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    a = sample(df, 10, key_field="k")
    b = sample(df.repartition(7), 10, key_field="k")
    assert rows(a, "k") == rows(b, "k")  # order/partitioning-free membership
    assert a.columns == ["k", "sample_rate"]
    assert a.select("sample_rate").distinct().collect()[0][0] == 10
    n = a.count()
    assert 50 < n < 200  # ~1/10


def test_sample_exclude_bypass(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    out = sample(df, 1000000, key_field="k", exclude=F.col("k") < 5, stamp=False)
    kept = [r.k for r in out.collect()]
    assert set(range(5)).issubset(kept)


def test_sample_md5_rate_validation(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        sample(df, 3, key_field="k", method="md5")  # 3 does not divide 256
