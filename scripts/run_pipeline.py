#!/usr/bin/env python
"""spark-submit entry point for the north-rule pages pipeline.

Packaging (the reference ships one binary + a config; we ship one zip + a
config):

    cd /root/repo && zip -qr /tmp/vector_spark.zip vector_spark
    spark-submit --py-files /tmp/vector_spark.zip scripts/run_pipeline.py \\
        --input  /data/pages_parquet_or_iceberg_dir \\
        --output /data/sinks/routed \\
        --checkpoint-dir /data/checkpoints \\
        --run-id crawl-2026-08-16

The job is RESUMABLE: work is split into deterministic url-hash buckets;
completed buckets are recorded in the checkpoint table and skipped on
restart (vector_spark.runtime.checkpoint — the analogue of the reference's
file checkpointer + acknowledgements). Re-running a partially-failed job
converges to exactly the full output with no duplicates.

On exit it prints one JSON line of Vector-style counters
(component_received/sent events/bytes) from the observe() metrics layer
plus the per-run checkpoint roll-up.

With --topology CONFIG.yaml it instead compiles and runs a declarative
topology (vector_spark.topology) — the `vector --config` analogue.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=False, help="pages parquet dir")
    ap.add_argument("--output", required=False, help="sink dir (partitioned by bucket/route)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--window-secs", type=int, default=3600)
    ap.add_argument("--topology", default=None, help="YAML topology config to run instead")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic pages instead of --input (demo/bench)")
    ap.add_argument("--compact", action="store_true",
                    help="after the (resumed) pass commits, run one sink "
                         "compaction pass (runtime/compact.py) so N resumed/"
                         "streamed passes don't accrete small files")
    ap.add_argument("--compact-target-bytes", type=int, default=128 << 20)
    ap.add_argument("--validate", action="store_true",
                    help="compile/typecheck the --topology config and exit "
                         "without starting Spark (the `vector validate` "
                         "analogue: names, inputs, cycles, ports, event-kind "
                         "edges, env interpolation)")
    ap.add_argument("--test", action="store_true",
                    help="run the config's `tests:` blocks (the `vector test "
                         "c.yaml` analogue, vector_spark.testing): inject "
                         "inputs at insert_at, assert extract_from outputs; "
                         "exit 1 on any failure")
    ap.add_argument("--graph", action="store_true",
                    help="print the --topology config as GraphViz DOT and "
                         "exit without starting Spark (the `vector graph` "
                         "analogue)")
    ap.add_argument("--list", action="store_true",
                    help="print the available component types as JSON and "
                         "exit (the `vector list` analogue)")
    args = ap.parse_args()

    if args.list:
        from vector_spark.topology import component_types

        print(json.dumps(component_types()))
        return

    if args.graph:
        from vector_spark.topology import load_toml, load_yaml, topology_dot

        if not args.topology:
            ap.error("--graph requires --topology CONFIG")
        load = load_toml if args.topology.endswith(".toml") else load_yaml
        print(topology_dot(load(args.topology)), end="")
        return

    if args.validate:
        from vector_spark.topology import compile_topology, load_toml, load_yaml

        if not args.topology:
            ap.error("--validate requires --topology CONFIG")
        load = load_toml if args.topology.endswith(".toml") else load_yaml
        try:
            compiled = compile_topology(load(args.topology))
        except Exception as e:  # noqa: BLE001 — validate REPORTS any config
            # failure (missing file, parse error, bad spec shape), exactly
            # like `vector validate`; TopologyError carries one entry per
            # error, anything else becomes a single typed entry
            errors = getattr(e, "errors", None) or [f"{type(e).__name__}: {e}"]
            print(json.dumps({"validated": False, "errors": errors}))
            sys.exit(78)  # EX_CONFIG, as `vector validate` exits nonzero
        print(json.dumps({
            "validated": True,
            "components": sorted(compiled.order),
        }))
        return

    from pyspark.sql import functions as F

    from vector_spark.session import get_spark

    spark = get_spark("vector-spark-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    if args.test:
        from vector_spark.testing import run_unit_tests
        from vector_spark.topology import load_toml, load_yaml

        if not args.topology:
            ap.error("--test requires --topology CONFIG")
        load = load_toml if args.topology.endswith(".toml") else load_yaml
        spec = load(args.topology)
        n_tests = len(spec.get("tests", []))
        failures = run_unit_tests(spark, spec)
        print(json.dumps({
            "tests": n_tests,
            "passed": n_tests - len({f.split(":", 1)[0] for f in failures}),
            "failures": failures,
        }))
        sys.exit(1 if failures else 0)

    if args.topology:
        from vector_spark.topology import compile_topology, load_toml, load_yaml

        # same loader rule as --validate: a TOML config that validates
        # must also run
        load = load_toml if args.topology.endswith(".toml") else load_yaml
        spec = load(args.topology)
        topo = compile_topology(spec).build(spark)
        results = topo.run()
        out = {"sinks": {k: str(v) for k, v in results.items()}}
        if args.compact:
            from vector_spark.runtime import compact_sink

            out["compaction"] = {
                name: compact_sink(
                    spark, cfg["path"],
                    target_file_bytes=args.compact_target_bytes,
                )
                for name, cfg in spec.get("sinks", {}).items()
                if cfg.get("type") == "parquet" and cfg.get("partition_by")
            }
        print(json.dumps(out))
        return

    from vector_spark.plans.pages import PAGE_ROUTES, parse_pages
    from vector_spark.operators.route import routed_union
    from vector_spark.runtime import CheckpointedRun, PipelineMetrics, with_lineage
    from vector_spark.sources import generate_pages, geo_dim, lang_dim

    if args.generate:
        pages = generate_pages(spark, args.generate)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("--input or --generate required")
    if not (args.output and args.checkpoint_dir and args.run_id):
        ap.error("--output, --checkpoint-dir and --run-id required")

    metrics = PipelineMetrics()
    pages = with_lineage(pages, "pages")
    pages = metrics.instrument(pages, "source", bytes_col=F.length("html"))

    ck = CheckpointedRun(
        spark, args.checkpoint_dir, args.run_id, n_buckets=args.n_buckets
    )

    def transform(df):
        parsed = parse_pages(df)
        from pyspark.sql.functions import broadcast

        enriched = parsed.join(broadcast(geo_dim(spark)), "tld", "left").join(
            broadcast(lang_dim(spark)), "lang", "left"
        )
        return routed_union(enriched, PAGE_ROUTES)

    t0 = time.time()
    committed = ck.run(pages, transform, args.output, bytes_col="html_bytes")
    wall = time.time() - t0

    out = {
        "run_id": args.run_id,
        "buckets_committed_this_pass": committed,
        "wall_seconds": round(wall, 1),
        **ck.metrics(),
        "components": metrics.collect(),
    }
    if args.compact:
        from vector_spark.runtime import compact_sink

        out["compaction"] = compact_sink(
            spark, args.output, target_file_bytes=args.compact_target_bytes
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
