#!/usr/bin/env python
"""spark-submit entry point for the crawl link-graph job.

Cluster usage:

    spark-submit --py-files ocr_platform_spark.zip \
        run_linkgraph.py --warc 's3://crawl/segments/*/warc/*.warc.gz' \
        --output <ranked hosts path> [--iters 10]

(add the warm-import daemon pair of confs from run_extract.py's docstring
when the package is installed on executor nodes; a bare --py-files deploy
cannot ship the daemon — Spark spawns it before the zip reaches workers.)

Sandbox usage (runs on the committed fixture crawl when --warc is omitted):

    python run_linkgraph.py --output /tmp/hostrank

The job (plans/linkgraph_job.py): WARC container parse → clean captures →
anchor extraction → cross-host edge distinct → exact-integer PageRank →
ranked hosts parquet. Everything upstream of the edge distinct is
shuffle-free; the job's first exchange carries bare host pairs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warc", help="crawl glob of .warc.gz files "
                    "(default: the committed fixture crawl)")
    ap.add_argument("--output", required=True, help="ranked-hosts path")
    ap.add_argument("--iters", type=int, default=None,
                    help="PageRank iterations (default: webgraph.PR_ITERS)")
    ap.add_argument("--cores", type=int, default=None,
                    help="local[] parallelism (sandbox only)")
    args = ap.parse_args()

    from ocr_platform_spark.operators.webgraph import PR_ITERS
    from ocr_platform_spark.plans.linkgraph_job import run_linkgraph_job
    from ocr_platform_spark.session import build_spark
    from ocr_platform_spark.sources.warc import FIXTURE_DIR

    spark = build_spark("linkgraph", cores=args.cores)
    glob = args.warc or str(FIXTURE_DIR / "*.warc.gz")
    ranked = run_linkgraph_job(spark, glob, args.iters or PR_ITERS)
    ranked.write.mode("overwrite").parquet(args.output)
    top = ranked.limit(10).collect()
    print(f"wrote host ranks -> {args.output}")
    if not top:
        # the committed fixture crawl's pages link only within their own
        # host (relative/fragment anchors), so its cross-host graph is
        # empty; tests/test_linkgraph_job.py drives a cross-host crawl
        print("  (no cross-host links in this crawl -> empty graph)")
    for r in top:
        print(f"  {r['host']:30s} {r['rank_x1e6']}")


if __name__ == "__main__":
    main()
