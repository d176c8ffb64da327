"""End-to-end spark-submit --py-files launch (the north-rule contract).

Builds dist/turtle_spark.zip, then launches the full pipeline through
the real ``spark-submit`` binary from a NEUTRAL working directory (repo
not on sys.path), proving the zip is self-contained.  A second launch
with the same workdir must resume every stage.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from tools.build_pyfiles import build

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)
def test_spark_submit_pipeline_runs_and_resumes(tmp_path):
    zip_path = build(tmp_path / "turtle_spark.zip")
    main_py = tmp_path / "pipeline_main.py"
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    main_py.write_text((repo / "tools" / "pipeline_main.py").read_text())

    def launch():
        return subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", str(zip_path),
                str(main_py),
                "--generate", "40",
                "--workdir", str(tmp_path / "wd"),
                "--fingerprint", "submit-smoke-1",
                "--extract-chunks", "2",
                "--buckets", "8",
            ],
            cwd=tmp_path,  # neutral cwd: the repo must NOT be importable
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
            capture_output=True,
            text=True,
            timeout=900,
        )

    r1 = launch()
    assert r1.returncode == 0, r1.stderr[-3000:]
    out1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["rows"] > 0
    assert out1["stages_resumed"] == []

    r2 = launch()
    assert r2.returncode == 0, r2.stderr[-3000:]
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["rows"] == out1["rows"]
    # every stage (and both extract chunks) resumed from the manifest
    assert "extract_chunk_0000" in out2["stages_resumed"]
    assert "extract_chunk_0001" in out2["stages_resumed"]
    assert {"terms", "edges", "components"} <= set(out2["stages_resumed"])
