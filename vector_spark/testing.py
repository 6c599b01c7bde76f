"""Declarative unit-test harness — the `vector test` analogue.

Reference: `vector test c.yaml` strips real sources/sinks from a topology,
injects literal events at `insert_at` points, captures events at
`extract_from` outputs, and asserts each captured event against boolean VRL
conditions (/root/reference/src/config/unit_test/mod.rs:99-155,
unit_test_components.rs:26,140; behavior suites at
/root/reference/tests/behavior/transforms/*.toml).

Our spec (dict or YAML, embeddable next to the topology):

    transforms: {...}            # the topology under test (no sources needed)
    tests:
      - name: routes errors
        insert_at: parsed        # component whose input gets the rows
        schema: "event_id long, event_type string"
        inputs:
          - [1, error]
          - [2, click]
        outputs:
          - extract_from: routed.errors
            conditions: ["event_id = 1"]        # every row must satisfy all
            count: 1                            # optional exact row count
        no_outputs_from: [routed.signup]        # ports that must be empty

run_unit_tests returns a list of failure strings (empty = all green), so a
single pytest test can execute a whole behavior suite.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .topology import TopologyError, compile_topology


def run_unit_tests(
    spark: SparkSession, spec: dict[str, Any], tables: dict | None = None
) -> list[str]:
    failures: list[str] = []
    for test in spec.get("tests", []):
        name = test.get("name", "<unnamed>")
        insert_at = test["insert_at"]
        # build a mini-topology: the injected rows become the sole source
        # feeding `insert_at`, exactly like UnitTestSourceConfig
        src_name = f"__test_input__"
        transforms = {k: dict(v) for k, v in spec.get("transforms", {}).items()}
        if insert_at not in transforms:
            failures.append(f"{name}: insert_at {insert_at!r} is not a transform")
            continue
        transforms[insert_at]["inputs"] = [src_name]
        topo_spec = {
            "sources": {
                src_name: {
                    "type": "inline",
                    "rows": [tuple(r) for r in test["inputs"]],
                    "schema": test["schema"],
                }
            },
            "transforms": transforms,
        }
        try:
            built = compile_topology(topo_spec).build(spark, tables=tables)
        except TopologyError as e:
            failures.append(f"{name}: compile error: {e}")
            continue

        for out in test.get("outputs", []):
            ref = out["extract_from"]
            if ref not in built.nodes:
                failures.append(f"{name}: unknown output {ref!r}")
                continue
            df = built[ref]
            total = df.count()
            if "count" in out and total != out["count"]:
                failures.append(
                    f"{name}: {ref} expected {out['count']} rows, got {total}"
                )
            for cond in out.get("conditions", []):
                bad = df.filter(~F.coalesce(F.expr(cond), F.lit(False))).count()
                if bad:
                    failures.append(
                        f"{name}: {ref}: {bad}/{total} rows violate {cond!r}"
                    )
        for ref in test.get("no_outputs_from", []):
            if ref not in built.nodes:
                failures.append(f"{name}: unknown no-output port {ref!r}")
                continue
            n = built[ref].count()
            if n:
                failures.append(f"{name}: expected no output from {ref}, got {n} rows")
    return failures
