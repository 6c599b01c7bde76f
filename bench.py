#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], plus the north-rule throughput probe: the full
parse -> enrich -> route -> aggregate pages pipeline over a generated
1M-row Common-Crawl-style table, reported as events/sec.

    python bench.py                 # single-level bench, one JSON line
    python bench.py --scaling       # N vs 4N cores scaling run (subprocesses),
                                    # prints the one JSON line with scaling keys
    python bench.py --pages-only N  # internal: pipeline throughput at N rows

Queries execute via a noop-style sink (count of a fully materialized plan)
— no driver collect of bulk rows, so the measurement is executor-side
throughput, as on a real cluster.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

PAGES_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "1000000"))
# the scaling run needs enough work that per-job fixed costs (broadcast
# build, stage scheduling, codegen) are amortized at the high core count —
# runtime at local[32] should be >=20s for a clean ratio
SCALING_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "12000000"))

HEADLINE = [
    "pipeline_events_e2e",
    "aggregate_tumbling",
    "reduce_sessions",
    "dedupe_first",
    "throttle",
    "route_multi",
    "enrich_customer",
    "tpch_q1",
    "tpch_q3",
    "dedup_exact_text",
    "dedup_minhash_lsh",
    "text_quality",
    "token_count",
    "cosine_topk",
]


def _pages_table(spark, n_rows: int) -> str:
    """Materialize the Common-Crawl-style input table once (outside any
    timer) — the measured pipeline reads it like the 10^12-row Iceberg
    table it stands in for."""
    path = f"/tmp/vector_spark_bench_pages_{n_rows}"
    import os.path

    if not os.path.exists(f"{path}/_SUCCESS"):
        from vector_spark.sources import generate_pages

        generate_pages(spark, n_rows, partitions=64).write.mode("overwrite").parquet(path)
    return path


def run_pages(spark, n_rows: int, samples: int = 3, rollup: bool = True) -> tuple[float, int]:
    """North-rule probe: parse -> enrich -> route -> aggregate over the
    materialized pages table. One warm-up run (codegen/JIT), then the
    median of `samples` timed runs. Returns (seconds, rows)."""
    import statistics

    from vector_spark.plans import pages_pipeline
    from vector_spark.sources import geo_dim, lang_dim

    pages = spark.read.parquet(_pages_table(spark, n_rows))
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))
    sink = out["sink_counts"]
    sink.write.format("noop").mode("overwrite").save()  # warm-up
    times = []
    for _ in range(samples):
        t0 = time.time()
        sink.write.format("noop").mode("overwrite").save()
        if rollup:
            out["domain_rollup"].write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return statistics.median(times), n_rows


def single_level(sf_dir: str) -> dict:
    from vector_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    pipe_s, pipe_rows = run_pages(spark, PAGES_ROWS)
    timings["pages_pipeline_1m"] = round(pipe_s, 3)
    events_per_sec = pipe_rows / pipe_s

    return {
        "metric": "end-to-end events/sec (parse->enrich->route->aggregate), 1M pages",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "events_per_sec": round(events_per_sec, 1),
        "pages_rows": pipe_rows,
        "cores": spark.sparkContext.defaultParallelism,
    }


def pages_only(n_rows: int) -> None:
    """Subprocess entry for the scaling run: prints seconds on stdout."""
    from vector_spark.session import get_spark

    spark = get_spark("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    secs, _ = run_pages(spark, n_rows, samples=2, rollup=False)
    print(json.dumps({"seconds": secs, "rows": n_rows,
                      "cores": spark.sparkContext.defaultParallelism}))


def scaling(sf_dir: str, n_small: int = 8) -> dict:
    """Run the pages pipeline at local[N] and local[4N] in separate
    subprocesses (one JVM each) on identical input; efficiency =
    (throughput@4N) / (4 * throughput@N). Evidences the north rule's
    two-cluster-size criterion in-sandbox (see BASELINE.md)."""
    out = single_level(sf_dir)
    # pre-materialize the scaling table with the full-width session so the
    # local[N] subprocess doesn't pay generation at low parallelism
    from vector_spark.session import get_spark

    _pages_table(get_spark("bench"), SCALING_ROWS)
    levels = {}
    for cores in (n_small, n_small * 4):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cores),
            SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            # scan splits small enough that both levels see >=4 tasks/core
            SPARK_GRAFT_MAX_PARTITION_BYTES="4m",
        )
        res = subprocess.run(
            [sys.executable, __file__, "--pages-only", str(SCALING_ROWS)],
            capture_output=True, text=True, env=env, check=True,
        )
        line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        levels[cores] = r["rows"] / r["seconds"]
    eff = levels[n_small * 4] / (4 * levels[n_small])
    out["scaling"] = {
        f"events_per_sec_local[{n_small}]": round(levels[n_small], 1),
        f"events_per_sec_local[{n_small * 4}]": round(levels[n_small * 4], 1),
        "efficiency_N_to_4N": round(eff, 3),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pages-only", type=int, default=None)
    args = ap.parse_args()

    if args.pages_only:
        pages_only(args.pages_only)
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    result = scaling(sf_dir) if args.scaling else single_level(sf_dir)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
