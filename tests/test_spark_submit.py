"""Deployment-shape check: the engine runs via ``spark-submit --py-files``
(the north rule's cluster deployment contract) — the package ships as a
plain zip with no install step, the pipeline CLI is the entry script, and
the run produces committed epochs with lineage JSON on stdout."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys

import pytest


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    pkg = shutil.make_archive(str(tmp_path / "cdcrypt_pkg"), "zip",
                              "/root/repo", "cdcrypt")
    stream = str(tmp_path / "stream")
    subprocess.run(
        [sys.executable, "-c",
         "from cdcrypt.sources.changegen import GenSpec, generate_to_dir;"
         f"generate_to_dir({stream!r}, GenSpec(n_convs=40, avg_turns=4,"
         "n_epochs=2, seed=5))"],
        check=True, env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin"},
    )
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", pkg,
         "/root/repo/cdcrypt/streaming/pipeline.py",
         "--source", stream, "--table", str(tmp_path / "t"),
         "--ckpt", str(tmp_path / "c"), "--buckets", "4"],
        capture_output=True, text=True, timeout=280, check=True,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    summary = json.loads(lines[-1])
    assert summary == {"epochs_applied": 2, "committed_epoch": 1}
    lineage = json.loads(lines[0])
    assert lineage["epoch"] == 0 and lineage["rows_written"] > 0
