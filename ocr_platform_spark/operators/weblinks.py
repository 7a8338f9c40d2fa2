"""Outlink/anchor extraction as a Spark operator: the crawl→link-graph
step. One Arrow-batched ``mapInPandas`` kernel over the pages table emits
one row per anchor — href (raw + resolved), anchor text, link kind,
boilerplate flag — so the host graph (operators/webgraph.py) and the
anchor-text corpus are both one projection away.

Shape at scale: zero shuffles — page bytes never leave the executor that
scanned them; output rows are tiny next to the html payload. Building
the host edge list from here is `select(host(url), host(resolved))
.distinct()` — the groupBy lands on the already-small link table.

Oracle: fixture parquet staged by tools/make_driver_fixtures.py running
the same pure-Python kernel sequentially outside Spark (the mm_*/warc
pattern; scale-free synthetic input, no sf pin needed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType, IntegerType, StringType, StructField, StructType,
)

from ocr_platform_spark.operators.registry import fixture_sql as _fixture_sql

LINKS_DOCS = 300   # == tools/make_driver_fixtures.py:extract_links_fixture

LINKS_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("link_no", IntegerType(), False),
    StructField("href_raw", StringType(), False),
    StructField("resolved", StringType(), True),
    StructField("anchor_text", StringType(), False),
    StructField("kind", StringType(), False),
    StructField("boilerplate", BooleanType(), False),
])


def links_df(pages: DataFrame) -> DataFrame:
    """pages(url, html) → one row per anchor (never-drop, typed kinds)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_platform_spark.extract.links import extract_links

        cols = [f.name for f in LINKS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                for lk in extract_links(url, html):
                    rows.append((url, lk.link_no, lk.href_raw, lk.resolved,
                                 lk.anchor_text, lk.kind, lk.boilerplate))
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(kernel, LINKS_SCHEMA)


def extract_links_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_platform_spark.sources.pages import pages_df

    return links_df(pages_df(spark, LINKS_DOCS))


QUERIES: dict = {
    "extract_links": (extract_links_q, _fixture_sql("extract_links.parquet")),
}
