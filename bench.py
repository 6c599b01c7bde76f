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


def _materialize(df) -> int:
    """Execute the full plan, executor-side only (no bulk collect)."""
    return df.write.format("noop").mode("overwrite").save() or df.count()


def run_pages(spark, n_rows: int) -> tuple[float, int]:
    """North-rule probe: full pages pipeline over n generated rows.
    Returns (seconds, rows processed)."""
    from vector_spark.plans import pages_pipeline
    from vector_spark.sources import generate_pages, geo_dim, lang_dim

    parallelism = spark.sparkContext.defaultParallelism
    pages = generate_pages(spark, n_rows, partitions=parallelism * 2)
    out = pages_pipeline(pages, geo_dim(spark), lang_dim(spark))
    t0 = time.time()
    out["sink_counts"].write.format("noop").mode("overwrite").save()
    out["domain_rollup"].write.format("noop").mode("overwrite").save()
    return time.time() - t0, n_rows


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
    # warm-up: JVM/codegen, tiny
    run_pages(spark, 10_000)
    secs, _ = run_pages(spark, n_rows)
    print(json.dumps({"seconds": secs, "rows": n_rows,
                      "cores": spark.sparkContext.defaultParallelism}))


def scaling(sf_dir: str, n_small: int = 8) -> dict:
    """Run the pages pipeline at local[N] and local[4N] in separate
    subprocesses (one JVM each) on identical input; efficiency =
    (throughput@4N) / (4 * throughput@N). Evidences the north rule's
    two-cluster-size criterion in-sandbox (see BASELINE.md)."""
    out = single_level(sf_dir)
    levels = {}
    for cores in (n_small, n_small * 4):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        res = subprocess.run(
            [sys.executable, __file__, "--pages-only", str(PAGES_ROWS)],
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
