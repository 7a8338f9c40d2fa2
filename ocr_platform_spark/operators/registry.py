"""Single registry of driver-checkable queries: name → spark fn + oracle SQL.

Merged into ``__spark_entry__.queries()`` / ``oracle_sql()``. Entries whose
oracle is None are genuinely non-SQL-expressible (probabilistic LSH paths,
Python-only scorers, extraction itself) — the driver records a rows-only
check for those and pytest carries the exactness burden instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from ocr_platform_spark.operators import (
        dedup, relational, scalar_queries, similarity, text_analysis)
    return (relational, scalar_queries, text_analysis, dedup, similarity)


def _mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing demo over synthesized page payloads (rows-only)."""
    from pyspark.sql import functions as F
    from ocr_platform_spark.operators.multimodal import media_features
    from ocr_platform_spark.sources.pages import pages_df

    feats = media_features(pages_df(spark, 200))
    return feats.select("url", "n_bytes", "format", "sha256",
                        F.element_at("feature", 1).alias("f0"))


def all_entries() -> dict[str, tuple[Callable, str | None]]:
    out: dict[str, tuple[Callable, str | None]] = {}
    for mod in _modules():
        for name, (fn, sql) in mod.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = (fn, sql)
    out["mm_features"] = (_mm_features, None)
    return out


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_entries().items()}


def oracle_queries() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_entries().items()
            if sql is not None}
