"""Deployability gate (north rule): the engine runs via
``spark-submit --py-files dtaianomaly_spark.zip`` with NO repo on the
path — everything executors need ships in the zip."""

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    import pyspark

    zip_path = tmp_path / "dtaianomaly_spark.zip"
    pkg = os.path.join(REPO, "dtaianomaly_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    out_dir = tmp_path / "store"
    proc = subprocess.run(
        [
            submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            os.path.join(REPO, "scripts", "submit_rollup.py"),
            "/root/testdata/sf0.001", str(out_dir), "2",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=500,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON output:\n{proc.stderr[-2000:]}"
    result = json.loads(lines[-1])
    assert result["processed_batches"] == 2
    assert result["rollup_points"] > 0
