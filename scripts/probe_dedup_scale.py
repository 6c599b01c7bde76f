"""Dedup-ladder scale probe (VERDICT_r4 item 8).

The bucketed near-dup designs are plan-audited; this MEASURES them
beyond the sf0.1 contract scale on a synthetic documents corpus with a
planted duplicate structure, at several sizes, recording per-stage wall
time, candidate/verified-pair counts, and the AQE shuffle evidence from
the executed plans. Linear-ish growth of pairs and time across sizes is
the 100 TB argument made empirical.

Corpus: doc_id 0..n-1 in groups of 10; members 1 and 2 of each group
are ~10%-word mutations of the group leader (near-dups, jaccard ~0.7),
member 3 is an EXACT copy of the leader; everything else is independent
text. ~40 words/doc from a 5000-word vocabulary, all deterministic
expressions of doc_id (partitioning-invariant, no driver data).

Usage: python scripts/probe_dedup_scale.py [--sizes 100000,300000,1000000]
Prints one JSON line per size plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_documents(spark, n: int):
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    pos = F.col("id") % 10
    leader = F.col("id") - pos
    # members 1/2 mutate the leader's text; member 3 copies it exactly
    base_id = F.when(pos.isin(1, 2, 3), leader).otherwise(F.col("id"))
    is_mut = pos.isin(1, 2)

    def word(i):
        w = F.pmod(F.xxhash64(base_id, F.lit(17), i), F.lit(5000))
        mut = is_mut & (F.pmod(F.xxhash64(F.col("id"), F.lit(23), i), F.lit(10)) == 0)
        wm = F.pmod(F.xxhash64(F.col("id"), F.lit(29), i), F.lit(5000))
        return F.concat(F.lit("w"), F.when(mut, wm).otherwise(w).cast("string"))

    text = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(39)), word), " "
    )
    return df.select(F.col("id").alias("doc_id"), text.alias("text"))


def _aqe_evidence(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "aqe_shuffle_reads": len(re.findall(r"AQEShuffleRead", plan)),
        "skew_handled": len(re.findall(r"skewed", plan, re.I)),
        "coalesced": len(re.findall(r"coalesced", plan, re.I)),
    }


def probe(spark, n: int, samples: int) -> dict:
    from pyspark.sql import functions as F

    from vector_spark.datapipe import (
        dedup_clusters,
        incremental_dedup,
        minhash_lsh_pairs,
    )

    docs = synth_documents(spark, n)
    # materialize once so every stage times its own work, not generation
    path = f"/tmp/vs_dedup_scale_{n}"
    docs.write.mode("overwrite").parquet(path)
    d = spark.read.parquet(path)
    out: dict = {"n_docs": n}

    def timed(name, df):
        df.write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(samples):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = {"min_sec": min(ts), "samples_sec": ts,
                     "rows": df.count(), "aqe": _aqe_evidence(df)}

    timed("minhash_lsh_pairs", minhash_lsh_pairs(d, threshold=0.5))
    timed("dedup_clusters", dedup_clusters(d, jaccard_threshold=0.5))
    delta = d.filter(F.col("doc_id") % 4 == 0)
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    timed("incremental_dedup",
          incremental_dedup(delta, corpus, near=True, threshold=0.5))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,300000,1000000")
    ap.add_argument("--samples", type=int, default=2)
    args = ap.parse_args()

    from vector_spark.session import get_spark

    spark = get_spark("probe_dedup_scale")
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

    results = []
    for n in [int(s) for s in args.sizes.split(",")]:
        r = probe(spark, n, args.samples)
        results.append(r)
        print(json.dumps(r), flush=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        ratio = b["n_docs"] / a["n_docs"]
        summary = {"size_ratio": ratio}
        for k in ("minhash_lsh_pairs", "dedup_clusters", "incremental_dedup"):
            summary[k] = {
                "time_ratio": round(b[k]["min_sec"] / a[k]["min_sec"], 2),
                "rows_ratio": round(b[k]["rows"] / max(a[k]["rows"], 1), 2),
            }
        print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
