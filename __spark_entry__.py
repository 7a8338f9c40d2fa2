"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction job on synthesized
Common-Crawl-style pages (the BASELINE.json input_hint shape) and returns
the per-language rollup. ``queries()``/``oracle_sql()`` expose each
implemented operator from SURVEY.md §2 for the DuckDB correctness gate.

Column-name discipline: every computed column is aliased identically in the
Spark code and the oracle SQL (the driver hashes values after sorting
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# flagship: extraction pipeline → per-language rollup (SURVEY.md §7 slice)
# --------------------------------------------------------------------------

FLAGSHIP_DOCS = 500  # synthesized deterministically; no external data


def _extracted(spark: SparkSession, n_docs: int = FLAGSHIP_DOCS) -> DataFrame:
    from ocr_platform_spark.plans.extract_job import extract_pages
    from ocr_platform_spark.sources.pages import pages_df

    return extract_pages(pages_df(spark, n_docs), n_buckets=16)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract synthetic pages, roll up by language.

    Exercises P1-P3 (correct/structure/segment), P7-P8 (word count), R11
    (sum agg), D5 (lineage counters) end-to-end.
    """
    ext = _extracted(spark)
    return (
        ext.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("total_words").alias("sum_words"),
            F.sum(F.when(F.col("failed_stage").isNotNull(), 1).otherwise(0))
            .alias("n_failed"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# queries / oracles
# --------------------------------------------------------------------------

def _q_extract_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entry(spark)


def _q_extract_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw extraction output, oracled row-for-row against the staged
    pure-Python goldens (tests/fixtures/oracle/flagship_pages.parquet)."""
    return _extracted(spark).select(
        "url", "lang", "page_number", "total_words", "failed_stage",
        "blocks_kept", "blocks_dropped")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "extract_rollup": _q_extract_rollup,
        "extract_pages": _q_extract_pages,
    }
    from ocr_platform_spark.operators import registry
    q.update(registry.spark_queries())
    return q


def oracle_sql() -> dict[str, str]:
    from ocr_platform_spark.operators import registry

    # Flagship oracles: tools/make_driver_fixtures.py stages the
    # pure-Python extractor's output (the SAME oracle the goldens pin) as
    # parquet; extract_pages compares row-for-row against it and
    # extract_rollup is the SQL rollup over it.
    out = {
        "extract_pages": registry.fixture_sql(
            "flagship_pages.parquet",
            "url, lang, page_number, total_words, failed_stage, "
            "blocks_kept, blocks_dropped"),
        "extract_rollup": (
            "SELECT lang, count(*) AS n_docs, "
            "CAST(SUM(total_words) AS BIGINT) AS sum_words, "
            "CAST(SUM(CASE WHEN failed_stage IS NOT NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_failed FROM read_parquet('"
            f"{registry.ORACLE_FIXTURES / 'flagship_pages.parquet'}') "
            "GROUP BY lang"),
    }
    out.update(registry.oracle_queries())
    return out
