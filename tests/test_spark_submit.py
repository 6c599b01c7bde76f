"""Real `spark-submit --py-files` packaging smoke test.

The north rule requires the pipeline to run via `spark-submit --py-files`
on a cluster. tests/test_psl.py::test_package_zip_importable proves the
package is zipimport-clean; THIS test proves the whole deployment path:
build vector_spark.zip, copy the job script to a temp dir (so the repo
tree cannot shadow the zip on the driver), and run the actual
spark-submit binary twice — first pass commits all buckets, second pass
must be a checkpoint-resume no-op (buckets_committed_this_pass: 0),
mirroring the reference's resumable single-binary deployment
(`vector --config`, file checkpointer + acks).

One spark-submit JVM launch per pass (~30 s each) — kept to a single
small run (2k pages, 8 buckets, local[2]) for suite time.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str:
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    found = shutil.which("spark-submit")
    if found:
        return found
    pytest.skip("no spark-submit binary available")


def _build_zip(path: Path) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for p in (REPO / "vector_spark").rglob("*"):
            if p.is_file() and "__pycache__" not in p.parts:
                z.write(p, p.relative_to(REPO))


def _run(submit, workdir, zip_path, script, out_dir, ck_dir):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", str(zip_path), str(script),
         "--generate", "2000", "--n-buckets", "8",
         "--output", str(out_dir), "--checkpoint-dir", str(ck_dir),
         "--run-id", "submit-smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    json_lines = [ln for ln in proc.stdout.splitlines()
                  if ln.startswith("{") and "buckets_committed_this_pass" in ln]
    assert json_lines, f"no counters JSON on stdout:\n{proc.stdout[-2000:]}"
    return json.loads(json_lines[-1])


def test_spark_submit_py_files_end_to_end(tmp_path):
    submit = _spark_submit()
    zip_path = tmp_path / "vector_spark.zip"
    _build_zip(zip_path)
    script = tmp_path / "run_pipeline.py"
    shutil.copy(REPO / "scripts" / "run_pipeline.py", script)
    out_dir, ck_dir = tmp_path / "sink", tmp_path / "ck"

    first = _run(submit, tmp_path, zip_path, script, out_dir, ck_dir)
    assert first["buckets_committed_this_pass"] == 8
    assert first["components"], "metrics layer produced no counters"
    # routed parquet actually landed
    files = list(out_dir.rglob("*.parquet"))
    assert files, "no routed parquet written"

    second = _run(submit, tmp_path, zip_path, script, out_dir, ck_dir)
    assert second["buckets_committed_this_pass"] == 0  # resume no-op
