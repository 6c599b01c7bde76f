"""Golden behavior suite runner — executes tests/behavior/*.yaml through
the `vector test` analogue (vector_spark.testing.run_unit_tests)."""

from pathlib import Path

import yaml

from vector_spark.testing import run_unit_tests


def test_behavior_suite(spark):
    spec = yaml.safe_load((Path(__file__).parent / "behavior" / "transforms.yaml").read_text())
    failures = run_unit_tests(spark, spec)
    assert not failures, "\n".join(failures)


def test_harness_reports_violations(spark):
    """The harness itself must catch a wrong expectation."""
    spec = {
        "transforms": {
            "f": {"type": "filter", "inputs": ["x"], "condition": "v > 5"}
        },
        "tests": [
            {
                "name": "deliberately wrong",
                "insert_at": "f",
                "schema": "v int",
                "inputs": [[10]],
                "outputs": [
                    {"extract_from": "f", "count": 2, "conditions": ["v < 0"]}
                ],
                "no_outputs_from": ["f"],
            }
        ],
    }
    failures = run_unit_tests(spark, spec)
    assert len(failures) == 3  # count mismatch, condition violated, non-empty port
