"""End-to-end `spark-submit --py-files` proof on a real multi-executor master.

The north rule (BASELINE.json) verifies performance "by running the same job
via spark-submit --py-files at N and 4N executors". bench.py's cluster legs
ship the package to executors via PYTHONPATH (the timing-friendly stand-in);
this test exercises the real deployment path once, end to end:

  1. package the repo's `ocr_platform_spark/` into a zip with
     `shutil.make_archive` (exactly the README/run_extract.py recipe),
  2. `spark-submit --master local-cluster[2,2,..] --py-files <zip>
     run_extract.py` with the repo dir scrubbed from the environment's
     PYTHONPATH, so executor Python workers can ONLY resolve the package
     from the shipped zip. (The preloading daemon is deliberately absent:
     Spark spawns `spark.python.daemon.module` BEFORE the --py-files
     includes reach a worker's sys.path, so the daemon must be
     executor-resident — on a bare zip deploy the job runs with the stock
     daemon; session.py documents the opt-in for installed clusters.)
  3. assert the job extracts every generated page and writes the
     partitioned output + lineage manifest.

Reference analogue: the queue worker's deploy unit (apps/queue Dockerfile);
here the deployable artifact is the --py-files zip.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit")

N_DOCS = 400


def test_spark_submit_py_files_on_local_cluster(tmp_path):
    if SPARK_SUBMIT is None:
        import pytest
        pytest.skip("spark-submit not on PATH")

    zip_path = shutil.make_archive(
        str(tmp_path / "ocr_platform_spark"), "zip",
        str(REPO), "ocr_platform_spark")
    out = tmp_path / "extracted"

    # Scrub the repo from the inherited environment: the executor JVMs in
    # local-cluster mode inherit this env, so leaving the repo on PYTHONPATH
    # would let workers import the package from disk and the zip would go
    # untested.
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_LOCAL_DIRS"] = str(tmp_path / "scratch")

    cmd = [
        SPARK_SUBMIT,
        "--master", "local-cluster[2,2,2048]",
        "--conf", "spark.executor.memory=1536m",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--py-files", zip_path,
        str(REPO / "run_extract.py"),
        "--gen", str(N_DOCS), "--output", str(out), "--buckets", "16",
    ]
    proc = subprocess.run(
        cmd, env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=540)
    assert proc.returncode == 0, (
        f"spark-submit failed (rc={proc.returncode})\n"
        f"--- stdout tail ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr tail ---\n{proc.stderr[-4000:]}")
    assert f"extracted table: {N_DOCS} docs" in proc.stdout, proc.stdout[-2000:]

    # Output landed partitioned-by-bucket with a lineage manifest beside it.
    buckets = list(out.glob("bucket=*"))
    assert buckets, f"no bucket partitions under {out}"
    manifest = Path(str(out) + "_manifest")
    assert manifest.is_dir() and list(manifest.glob("*.parquet")), (
        f"no lineage manifest at {manifest}")
