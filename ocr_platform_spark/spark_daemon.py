"""Custom PySpark worker daemon: preload the hot import graph before fork.

Plain ``pyspark.daemon`` forks a worker per task and each fork then imports
pandas/pyarrow/numpy on first use — ~2-4 s per worker, and on a 32-core
executor 32 simultaneous cold imports contend for ~15 s of wall clock before
the first Arrow batch flows (measured in this sandbox; the same cliff exists
per executor on a real cluster after every executor (re)start).

Importing the heavy modules in the daemon *parent* lets every forked worker
inherit them via copy-on-write: worker start becomes a bare ``fork()``.
This is the Spark-native analogue of the reference's warm LRU cache
(apps/queue/src/lib/ocr.ts:15-33) applied to interpreter state instead of
documents.

Enabled by ``spark.python.daemon.module=ocr_platform_spark.spark_daemon``
(set in ocr_platform_spark.session.build_spark).
"""

from __future__ import annotations

import pyspark.daemon

if __name__ == "__main__":
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    # the worker loop + Arrow serializers used by mapInPandas / pandas_udf
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.worker  # noqa: F401

    # our extraction core — present when the repo (or its zip via --py-files)
    # is on the worker PYTHONPATH; harmless to skip otherwise
    try:
        import ocr_platform_spark.datagen  # noqa: F401
        import ocr_platform_spark.extract  # noqa: F401
    except ImportError:
        pass

    pyspark.daemon.manager()
