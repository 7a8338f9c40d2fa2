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

The preloaded heap is then FROZEN (``gc.freeze``): pyspark's daemon reuse
loop runs a full ``gc.collect()`` between every pair of tasks
(pyspark/daemon.py, the ``while True: worker(sock); gc.collect()`` loop),
which traverses every tracked object — ~75k objects once pandas/pyarrow
are preloaded, tens of ms per task on a quiet host and 200ms+ when the
cores are contended. Measured here: a 256-task mapInPandas stage on 4
cores spent 226 ms *per task* idle between tasks, ~4x the useful work.
``gc.freeze`` moves the preloaded graph to the permanent generation that
collections skip (the standard pre-fork-server idiom, also used by
gunicorn), so the per-task collect only sweeps objects created since the
fork — back to sub-ms. Import-preloading WITHOUT the freeze is a
pessimization: it makes every between-task GC slower than a cold stock
worker's.

Zip path entries are scrubbed for the same reason: every task's
``setup_spark_files`` (pyspark/worker_util.py) ends with
``importlib.invalidate_caches()``, and a zipimporter's invalidation forces
a re-parse of the zip's entire central directory on next use —
``zipimport._read_directory`` is pure Python and pyspark.zip has thousands
of entries, so a worker whose PYTHONPATH carries ``$SPARK_HOME/python/lib/
pyspark.zip`` (the default executor env) pays ~150 ms of directory
re-parsing PER TASK. Profiled here: 93% of worker_main's time on a
trivial 256-task mapInPandas stage was ``setup_spark_files →
invalidate_caches → zipimport._read_directory``. When every package a
zip entry provides also resolves from a real directory (pyspark installed
in site-packages — the common case, and this sandbox), the zip entry is
redundant: dropping it leaves only FileFinders, whose invalidation is a
dict clear. Entries that are the ONLY provider of their package (zip-only
cluster deploys, ``--py-files`` archives) are kept.

Enabled by ``spark.python.daemon.module=ocr_platform_spark.spark_daemon``
(set in ocr_platform_spark.session.build_spark).
"""

from __future__ import annotations

import gc

import pyspark.daemon


def _scrub_redundant_zip_paths() -> None:
    """Drop sys.path zip entries whose top-level packages all resolve from
    a non-zip path entry too; evict their importers so per-task
    ``importlib.invalidate_caches()`` never touches a zipimporter."""
    import importlib.machinery
    import sys
    import zipfile

    dir_paths = [p for p in sys.path
                 if p and not zipfile.is_zipfile(p)]
    keep: list[str] = []
    dropped: list[str] = []
    for p in sys.path:
        if not p or not zipfile.is_zipfile(p):
            keep.append(p)
            continue
        try:
            with zipfile.ZipFile(p) as zf:
                tops = {n.split("/", 1)[0] for n in zf.namelist()
                        if "/" in n and n.endswith((".py", ".so"))}
                tops |= {n[:-3] for n in zf.namelist()
                         if n.endswith(".py") and "/" not in n}
        except OSError:
            keep.append(p)
            continue
        finder = importlib.machinery.PathFinder
        if tops and all(
                finder.find_spec(t.removesuffix(".py"), dir_paths) is not None
                for t in tops if t.isidentifier()):
            dropped.append(p)
        else:
            keep.append(p)
    if not dropped:
        return
    sys.path[:] = keep
    for p in dropped:
        for key in [k for k in sys.path_importer_cache
                    if k == p or k.startswith(p + "/")]:
            del sys.path_importer_cache[key]


# decision cache for _drop_pythonless_zips: path -> is a zip with no
# python content (one directory read per distinct path per worker, ever)
_PYTHONLESS: dict[str, bool] = {}


def _drop_pythonless_zips() -> None:
    """Remove sys.path zip entries that contain no ``.py``/``.so`` at all
    (e.g. JVM jars the runner ships as per-task "python includes"): they
    can never satisfy a Python import, but once any import traverses one,
    its zipimporter lands in the importer cache and every subsequent
    task's ``invalidate_caches()`` forces a full central-directory
    re-parse — ~45 ms/task for a 10k-entry spark-core jar."""
    import sys
    import zipfile

    keep = []
    for p in sys.path:
        verdict = _PYTHONLESS.get(p)
        if verdict is None:
            verdict = False
            if p and p.endswith((".zip", ".jar", ".egg")) \
                    and zipfile.is_zipfile(p):
                try:
                    with zipfile.ZipFile(p) as zf:
                        verdict = not any(
                            n.endswith((".py", ".so")) for n in zf.namelist())
                except OSError:
                    verdict = False
            _PYTHONLESS[p] = verdict
        if verdict:
            for key in [k for k in sys.path_importer_cache
                        if k == p or k.startswith(p + "/")]:
                del sys.path_importer_cache[key]
        else:
            keep.append(p)
    sys.path[:] = keep


def _patch_setup_spark_files() -> None:
    """Wrap the per-task ``setup_spark_files`` so include paths that are
    Python-less jars are scrubbed right after being added — before any
    import can build a zipimporter for them. Best-effort: if pyspark's
    internals move, the unpatched original keeps working."""
    try:
        import pyspark.worker
        import pyspark.worker_util
    except ImportError:  # pragma: no cover
        return
    orig = pyspark.worker_util.setup_spark_files

    def setup_and_scrub(infile):
        orig(infile)
        _drop_pythonless_zips()

    pyspark.worker_util.setup_spark_files = setup_and_scrub
    # worker.py binds the name into its own globals at import time
    if getattr(pyspark.worker, "setup_spark_files", None) is orig:
        pyspark.worker.setup_spark_files = setup_and_scrub

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

    _scrub_redundant_zip_paths()
    _patch_setup_spark_files()

    # collect whatever import-time garbage exists, then freeze the heap so
    # the per-task gc.collect() in the daemon's worker-reuse loop skips it
    gc.collect()
    gc.freeze()

    pyspark.daemon.manager()
