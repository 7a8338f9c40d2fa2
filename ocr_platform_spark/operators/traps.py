"""Crawl-trap detection — URL-template families with duplicated content.

Calendar pages, session-id permutations and faceted-search grids
generate UNBOUNDED distinct URLs over a handful of distinct contents;
a frontier that cannot see this spends its politeness budget fetching
the same page forever (the classic "spider trap"). The standard cheap
detector aggregates by URL TEMPLATE — the path with digit runs
collapsed to a placeholder — and flags families whose distinct-URL
count dwarfs their distinct-content count:

    template  = path with [0-9]+ → 'D'   (plus query stripped)
    trap iff  n_urls >= MIN_FAMILY and n_contents * DUP_DEN <= n_urls

Both counts are plain distinct aggregates, so the whole detector is
one groupBy with map-side combine — frontier-scale by construction —
and the rule is exact integer math (no ratios). Content identity is
whatever the pipeline already computes per fetch (md5 of extracted
text; dd_exact's key); the synthetic corpus carries it as a column.

The corpus (orders-keyed, live-SQL mirrored) plants all the classes:
a calendar trap (hundreds of /cal/D/D urls, ONE content), a
session-id trap (/item/D?sid=D — distinct sids, content keyed by the
item only, so a few contents per many urls), an honest archive
(/post/D with distinct content per url — high n_urls but n_contents
== n_urls, must NOT flag), and small families under MIN_FAMILY that
are never judged. `cx_trap_detect` emits ONLY flagged families (the
actionable frontier blocklist); totals for the unflagged families are
pinned in pytest rather than shipped, keeping the output the thing a
crawler actually consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

TRAP_CAP = 3000        # o_orderkey < TRAP_CAP fetches
MIN_FAMILY = 10
DUP_DEN = 5            # trap iff n_contents * 5 <= n_urls


def _fetch_log(orders: DataFrame) -> DataFrame:
    """Deterministic fetch log: (url, content_key) menus on o_orderkey."""
    k = F.col("o_orderkey")
    ks = k.cast("string")
    g = (k / 40).cast("long").cast("string")    # content group for sids
    url = (F.when(k % 4 == 0,
                  F.concat(F.lit("https://trap.example.net/cal/2024/"),
                           ks, F.lit("/view")))
           .when(k % 4 == 1,
                 F.concat(F.lit("https://shop.example.com/item/"), g,
                          F.lit("?sid="), ks))
           .when(k % 4 == 2,
                 F.concat(F.lit("https://blog.example.org/post/"), ks))
           .otherwise(
               F.concat(F.lit("https://misc.example.org/p"),
                        (k % 8).cast("string"), F.lit("/"), ks)))
    content = (F.when(k % 4 == 0, F.lit("CAL-EMPTY-GRID"))
               .when(k % 4 == 1, F.concat(F.lit("item-"), g))
               .when(k % 4 == 2, F.concat(F.lit("post-"), ks))
               .otherwise(F.concat(F.lit("misc-"), ks)))
    return orders.select(url.alias("url"), content.alias("content_key"))


def trap_families(fetches: DataFrame,
                  min_family: int = MIN_FAMILY,
                  dup_den: int = DUP_DEN) -> DataFrame:
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    path = F.regexp_extract("url", r"^https?://[^/]+([^?]*)", 1)
    template = F.regexp_replace(path, "[0-9]+", "D")
    fam = (fetches
           .select(host.alias("host"), template.alias("template"),
                   "url", "content_key")
           .groupBy("host", "template")
           .agg(F.countDistinct("url").cast("long").alias("n_urls"),
                F.countDistinct("content_key").cast("long")
                .alias("n_contents")))
    return fam.where((F.col("n_urls") >= min_family)
                     & (F.col("n_contents") * dup_den <= F.col("n_urls")))


def cx_trap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < TRAP_CAP)
    return trap_families(_fetch_log(orders))


CX_TRAP_SQL = f"""
WITH fetches AS (
  SELECT CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 'https://trap.example.net/cal/2024/'
               || CAST(o_orderkey AS VARCHAR) || '/view'
           WHEN 1 THEN 'https://shop.example.com/item/'
               || CAST(o_orderkey // 40 AS VARCHAR)
               || '?sid=' || CAST(o_orderkey AS VARCHAR)
           WHEN 2 THEN 'https://blog.example.org/post/'
               || CAST(o_orderkey AS VARCHAR)
           ELSE 'https://misc.example.org/p'
               || CAST(o_orderkey % 8 AS VARCHAR) || '/'
               || CAST(o_orderkey AS VARCHAR) END AS url,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN 'CAL-EMPTY-GRID'
           WHEN 1 THEN 'item-' || CAST(o_orderkey // 40 AS VARCHAR)
           WHEN 2 THEN 'post-' || CAST(o_orderkey AS VARCHAR)
           ELSE 'misc-' || CAST(o_orderkey AS VARCHAR) END AS content_key
  FROM orders WHERE o_orderkey < {TRAP_CAP}),
fam AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         regexp_replace(regexp_extract(url, '^https?://[^/]+([^?]*)', 1),
                        '[0-9]+', 'D', 'g') AS template,
         CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
         CAST(count(DISTINCT content_key) AS BIGINT) AS n_contents
  FROM fetches GROUP BY 1, 2)
SELECT host, template, n_urls, n_contents
FROM fam
WHERE n_urls >= {MIN_FAMILY} AND n_contents * {DUP_DEN} <= n_urls
"""

QUERIES: dict = {
    # wave 60: crawl-trap template families, beyond-window
    "cx_trap_detect": (cx_trap_detect, CX_TRAP_SQL),
}
