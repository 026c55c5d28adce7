"""The north-rule launch shape, literally: ``spark-submit --py-files
osdocr_spark.zip scripts/run_extract.py`` as a subprocess — catches packaging
regressions (zip importability, script arg surface) that in-process tests
cannot."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_launch(tmp_path):
    pkg_zip = str(tmp_path / "osdocr_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w") as z:
        pkg = os.path.join(REPO, "osdocr_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        ["spark-submit", "--master", "local[8]", "--py-files", pkg_zip,
         os.path.join(REPO, "scripts", "run_extract.py"),
         "--input", SF, "--output", out_dir, "--partitions", "8"],
        capture_output=True, text=True, timeout=540,
        # keep the submitted job from importing the repo via inherited paths:
        # the zip must be the only way the workers see the package
        cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["urls"] == 500
    assert summary["words"] > 0
    assert os.path.isdir(os.path.join(out_dir, "extracted"))
    assert os.path.isdir(os.path.join(out_dir, "metrics"))
