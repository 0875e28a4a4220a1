"""north_rule contract: "run via spark-submit --py-files". Real
spark-submit subprocess with ONLY dist/engine.zip on the py-files path —
pins that the package is self-contained (no repo-root imports leak in)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_pyfiles_pipeline(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package_pyfiles.py")],
        check=True,
        capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "engine.zip")
    assert os.path.exists(zip_path)

    out_dir = str(tmp_path / "kg_out")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "scripts", "submit_pipeline.py"),
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out_dir,
        ],
        # run OUTSIDE the repo so the module can only come from the zip
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    report = json.loads(line)
    assert report["triples"] > 0
    assert os.path.isdir(out_dir)
