"""SparkSession builder with the engine's scale-oriented defaults.

Single place where execution knobs live, so tests / bench / driver entry all
run identical configs. Defaults target the sandbox (local[N], 128 GiB) but
every knob is what we would ship to a 1000-executor cluster:

- AQE on (runtime coalescing + skew-join splitting),
- Arrow pandas-UDF batches capped so multi-MB html blobs cannot blow an
  executor's Arrow buffer (SURVEY.md §4.2.4),
- shuffle partitions sized for the local core count (cluster deploys override
  via spark.sql.shuffle.partitions on submit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch cap: html blobs average ~3-8 KiB at test scale but hot-domain
# pages are boosted 6x; 2048 rows/batch keeps a batch well under 64 MiB even
# at 100x the synthetic blob size (SURVEY.md §4.2.4 spill safety).
ARROW_MAX_RECORDS = 2048


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def _local_dir() -> str:
    """Shuffle/spill scratch: tmpfs when present (the sandbox's virtio disk
    adds noise); on a real cluster this is per-node NVMe via spark-defaults."""
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        return d
    return os.environ.get("SPARK_LOCAL_DIRS", "/tmp")


def build_spark(app_name: str = "ocr-platform-spark",
                cores: int | None = None,
                shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the session. ``cores`` only matters for local mode."""
    n = cores or default_parallelism()
    sp = shuffle_partitions or max(2 * n, 8)
    return (
        SparkSession.builder.appName(app_name)
        .config("spark.local.dir", _local_dir())
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # preload pandas/pyarrow in the worker daemon so forked workers start
        # warm — kills the N-simultaneous-cold-imports cliff on wide executors
        # (see ocr_platform_spark/spark_daemon.py)
        .config("spark.python.daemon.module", "ocr_platform_spark.spark_daemon")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_MAX_RECORDS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
