"""Profile the streaming-flagship vs batch delta (VERDICT_r4 item 5).

Runs, on an idle machine, min-of-N probes that decompose
stream_pages_pipeline's cost at 1M rows:

  batch           — the batch flagship aggregate (reference point)
  stream_noop     — bare passthrough streaming query over the same
                    parquet source (source listing + offset/commit log +
                    query start/stop floor; no shuffle, no state)
  stream_stateless— parse+enrich+route, append mode, NO aggregate
                    (adds the per-batch stateless work)
  stream_agg      — the full flagship (adds shuffle + state store)
  stream_agg_rocks— same with the RocksDB state-store provider
  stream_agg_few  — same with state partitions = 8 (fewer store commits)

Usage: python scripts/profile_streaming.py [--rows 1000000] [--samples 3]
Prints one JSON line; paste the breakdown into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _min_of(fn, samples):
    ts = []
    for _ in range(samples):
        ts.append(round(fn(), 3))
    return {"min_sec": min(ts), "samples_sec": ts}


def _drain(writer):
    ck = tempfile.mkdtemp(prefix="vs_prof_ck_")
    t0 = time.time()
    q = (writer.option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    dt = time.time() - t0
    shutil.rmtree(ck, ignore_errors=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import _pages_table
    from vector_spark.session import get_spark
    from vector_spark.sources import geo_dim, lang_dim
    from vector_spark.streaming.ops import stream_pages_pipeline
    from vector_spark.plans.pages import parse_pages, PAGE_ROUTES
    from vector_spark.operators.route import routed_union
    from pyspark.sql.functions import broadcast

    spark = get_spark("profile_streaming")
    spark.sparkContext.setLogLevel("ERROR")
    path = _pages_table(spark, args.rows)
    schema = spark.read.parquet(path).schema
    geo, lang = geo_dim(spark), lang_dim(spark)

    out: dict = {"rows": args.rows}

    # batch reference: identical logical work, one batch job
    bdf = spark.read.parquet(path).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp"))
    parsed = parse_pages(bdf)
    enriched = parsed.join(broadcast(geo), "tld", "left").join(
        broadcast(lang), "lang", "left")
    routed = routed_union(enriched, PAGE_ROUTES)
    bagg = routed.groupBy(
        F.window("warc_ts", "3600 seconds"), "route", "geo_region"
    ).agg(F.count(F.lit(1)).alias("events"), F.sum("html_bytes").alias("bytes"))
    bagg.write.format("noop").mode("overwrite").save()  # warm

    def run_batch():
        t0 = time.time()
        bagg.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out["batch"] = _min_of(run_batch, args.samples)

    def stream_df():
        return (spark.readStream.schema(schema).parquet(path)
                .withColumn("warc_ts", F.col("warc_ts").cast("timestamp")))

    def run_noop():
        w = (stream_df().select("url").writeStream.format("noop")
             .outputMode("append"))
        return _drain(w)

    out["stream_noop"] = _min_of(run_noop, args.samples)

    def run_stateless():
        s = routed_union(
            parse_pages(stream_df())
            .join(broadcast(geo), "tld", "left")
            .join(broadcast(lang), "lang", "left"),
            PAGE_ROUTES,
        )
        w = s.writeStream.format("noop").outputMode("append")
        return _drain(w)

    out["stream_stateless"] = _min_of(run_stateless, args.samples)

    def run_agg():
        o = stream_pages_pipeline(stream_df(), geo, lang)
        w = o.writeStream.format("noop").outputMode("update")
        return _drain(w)

    out["stream_agg"] = _min_of(run_agg, args.samples)

    # RocksDB provider (per-query conf is session-scoped: set/restore)
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    rocks = ("org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    old = spark.conf.get(prov_key, None)
    try:
        spark.conf.set(prov_key, rocks)
        out["stream_agg_rocksdb"] = _min_of(run_agg, args.samples)
    except Exception as exc:  # provider missing in some builds
        out["stream_agg_rocksdb"] = {"error": str(exc)[:200]}
    finally:
        if old:
            spark.conf.set(prov_key, old)
        else:
            spark.conf.unset(prov_key)

    # fewer state partitions = fewer per-batch store commits
    sp_key = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(sp_key)
    try:
        spark.conf.set(sp_key, "8")
        out["stream_agg_8_state_parts"] = _min_of(run_agg, args.samples)
    finally:
        spark.conf.set(sp_key, old_sp)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
