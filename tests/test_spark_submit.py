"""north_rule launch clause: the engine runs via spark-submit --py-files
(the packaged zip is the ONLY import source for the job)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_dedup(tmp_path):
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "tools", "make_pyfiles_zip.py")],
                   check=True, cwd=ROOT)
    zpath = os.path.join(ROOT, "dist", "distributed_lsh_spark.zip")
    # the driver script itself comes OUT of the zip — no repo on sys.path
    with zipfile.ZipFile(zpath) as z:
        z.extract("distributed_lsh_spark/cli.py", str(tmp_path / "x"))
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]", "--py-files", zpath,
         str(tmp_path / "x" / "distributed_lsh_spark" / "cli.py"),
         "dedup", "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(tmp_path / "run"), "--run-id", "sub", "--cores", "4"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=360)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["n_docs"] == 500 and res["n_dup_pairs"] > 0
    assert (tmp_path / "run" / "sub" / "clusters" / "manifest.json").exists()
