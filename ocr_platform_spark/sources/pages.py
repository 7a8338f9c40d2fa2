"""Distributed synthesis of the Common-Crawl-style pages table.

Shape per BASELINE.json → input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Spark-first design: ``spark.range(n)`` gives a perfectly-balanced distributed
index space; ``mapInPandas`` turns each Arrow batch of indices into page rows
by calling the pure generator (``ocr_platform_spark.datagen.gen_document``,
a pure function of (seed, index)). No data ever funnels through the driver,
so the same call scales from 500 rows in tests to 10^12 on a cluster — the
generator IS the 100 TB table, materialized lazily per partition.

Replaces the reference's fetch-and-cache source path
(apps/queue/src/lib/ocr.ts:15-33): document bytes simply arrive as a
BinaryType column of the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def _gen_partition(seed: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import inside the task so executors resolve the module themselves
        from ocr_platform_spark.datagen import gen_document

        for pdf in batches:
            rows = [gen_document(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )
    return gen


def pages_df(spark: SparkSession, n_docs: int, seed: int = 42,
             partitions: int | None = None) -> DataFrame:
    """The synthetic pages table as a distributed DataFrame (no driver data)."""
    nparts = partitions or spark.sparkContext.defaultParallelism
    idx = spark.range(0, n_docs, 1, nparts)
    return idx.mapInPandas(_gen_partition(seed), schema=PAGES_SCHEMA)


MEDIA_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("media", BinaryType(), True),
])


def _gen_media_partition(seed: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.datagen import gen_media

        for pdf in batches:
            rows = [gen_media(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "media"])
    return gen


def media_df(spark: SparkSession, n_rows: int, seed: int = 42,
             partitions: int | None = None) -> DataFrame:
    """Synthetic media table (url, media:binary PNG payloads), distributed
    exactly like pages_df — the generator is the table."""
    nparts = partitions or spark.sparkContext.defaultParallelism
    idx = spark.range(0, n_rows, 1, nparts)
    return idx.mapInPandas(_gen_media_partition(seed), schema=MEDIA_SCHEMA)


def write_pages(spark: SparkSession, n_docs: int, path: str,
                seed: int = 42, partitions: int | None = None) -> None:
    """Materialize the pages table to parquet (bench/test input staging)."""
    pages_df(spark, n_docs, seed, partitions).write.mode("overwrite").parquet(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read a materialized pages table; in production this is
    ``spark.read.table(iceberg_tbl)`` — parquet is the sandbox fallback
    (SURVEY.md §7 'No Iceberg runtime in sandbox')."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)
