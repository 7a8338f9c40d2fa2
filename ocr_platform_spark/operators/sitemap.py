"""Sitemap ingestion (sitemaps.org XML) → robots-gated crawl seed list.

The other half of crawl governance (operators/robots.py): sitemaps
declare what a host WANTS crawled; robots.txt declares what it permits.
The seed list a polite crawler actually fetches is the intersection, and
this operator computes it in one plan: per-host sitemap.xml documents are
parsed with Spark's built-in ``from_xml`` (JVM-side, no Python), the
``<url>`` entries explode into one row each, and each entry picks up the
RFC 9309 verdict via the same broadcast rule arrays as cx_robots_filter.

Reference analogue: none (the reference ingests from a managed bucket);
this is the cx_* crawl-governance family, SURVEY.md §2.7.

Physical shape at scale: sitemaps, like robots files, number ~per host —
the parse side is tiny next to the page corpus, and the seed list it
emits is what DRIVES the big scan. Everything here is a projection over
one ``from_xml`` + one explode + one broadcast join; nothing shuffles.

Oracle independence: the DuckDB side never sees XML — it regenerates
entries and verdicts from the (host k, entry i) formulas, so a Spark
parse bug (entry loss, field swap, verdict leak) cannot cancel out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.robots import (
    N_HOSTS, best_match, rules_by_host)

_SITEMAP_SCHEMA = ("url ARRAY<STRUCT<loc: STRING, lastmod: STRING, "
                   "changefreq: STRING, priority: STRING>>")
_FREQS = ("daily", "weekly", "monthly")


def sitemap_corpus(spark: SparkSession) -> DataFrame:
    """Deterministic per-host sitemap.xml (host h{k}.example.net): host k
    declares 5 + k%4 entries whose paths rotate across the three robots
    rule families (/p/open/, /p/, /private/), with lastmod / changefreq /
    priority fields exercising the full element schema."""
    k = F.col("id")
    host = F.concat(F.lit("h"), k.cast("string"), F.lit(".example.net"))

    def entry(i):
        path = (F.when(i % 3 == 0, F.concat(F.lit("/p/open/s"),
                                            i.cast("string")))
                .when(i % 3 == 1, F.concat(F.lit("/p/s"), i.cast("string")))
                .otherwise(F.concat(F.lit("/private/s"), i.cast("string"))))
        day = F.lpad(((k + i) % 28 + 1).cast("string"), 2, "0")
        cf = F.element_at(F.array(*[F.lit(f) for f in _FREQS]),
                          (i % 3 + 1).cast("int"))
        pr = (F.when(i % 10 == 0, F.lit("1.0"))
              .otherwise(F.concat(F.lit("0."),
                                  (10 - i % 10).cast("string"))))
        return F.concat(
            F.lit("<url><loc>https://"), host, path,
            F.lit("</loc><lastmod>2026-01-"), day,
            F.lit("</lastmod><changefreq>"), cf,
            F.lit("</changefreq><priority>"), pr,
            F.lit("</priority></url>"))

    body = F.aggregate(
        F.transform(F.sequence(F.lit(0), F.lit(4) + k % 4), entry),
        F.lit(""), lambda acc, x: F.concat(acc, x))
    return spark.range(N_HOSTS).select(
        host.alias("host"),
        F.concat(F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
                 body, F.lit("</urlset>")).alias("sitemap_xml"))


def cx_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse every host's sitemap, explode its entries, and attach the
    robots verdict — the polite crawl seed list (never-drop: disallowed
    entries stay as flagged rows)."""
    entries = (sitemap_corpus(spark)
               .select("host", F.from_xml(
                   "sitemap_xml", _SITEMAP_SCHEMA).alias("s"))
               .select("host", F.posexplode("s.url").alias("i", "u")))
    u = F.col("u")
    path = F.replace(u["loc"],
                     F.concat(F.lit("https://"), F.col("host")), F.lit(""))
    j = (entries
         .select("host", F.col("i").cast("int").alias("entry_no"),
                 u["loc"].alias("loc"), path.alias("path"),
                 u["lastmod"].alias("lastmod"),
                 u["changefreq"].alias("changefreq"),
                 F.round(u["priority"].cast("double") * 100)
                 .cast("int").alias("priority_x100"))
         .join(F.broadcast(rules_by_host(spark)), "host", "left"))
    b = F.col("best")
    return (j.withColumn("best", best_match(F.col("path")))
            .select("host", "entry_no", "loc", "lastmod", "changefreq",
                    "priority_x100",
                    F.when(b.isNull(), F.lit(True)).otherwise(b["allow"] == 1)
                    .alias("allowed")))


CX_SITEMAP_SQL = """
WITH entries AS (
  SELECT k, unnest(generate_series(0, 4 + k % 4)) AS i
  FROM range(16) t(k)
), shaped AS (
  SELECT k, i,
         CASE WHEN i % 3 = 0 THEN '/p/open/s' || i
              WHEN i % 3 = 1 THEN '/p/s' || i
              ELSE '/private/s' || i END AS path,
         '2026-01-' || lpad(CAST((k + i) % 28 + 1 AS VARCHAR), 2, '0')
             AS lastmod,
         CASE i % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
              ELSE 'monthly' END AS changefreq,
         CAST(CASE WHEN i % 10 = 0 THEN 100 ELSE 100 - (i % 10) * 10 END
              AS INTEGER) AS priority_x100
  FROM entries)
SELECT 'h' || k || '.example.net' AS host,
       CAST(i AS INTEGER) AS entry_no,
       'https://h' || k || '.example.net' || path AS loc,
       lastmod, changefreq, priority_x100,
       -- robots verdict re-derived from the rule formula (never parsed):
       -- /private/ always blocked; /p/open/ allowed on k%3==0 hosts;
       -- /p/ blocked on k%3==0; catch-all / blocked on k%5==0; else allow
       CASE WHEN path LIKE '/private/%' THEN FALSE
            WHEN k % 3 = 0 AND path LIKE '/p/open/%' THEN TRUE
            WHEN k % 3 = 0 AND path LIKE '/p/%' THEN FALSE
            WHEN k % 5 = 0 THEN FALSE
            ELSE TRUE END AS allowed
FROM shaped
"""


QUERIES: dict = {
    "cx_sitemap": (cx_sitemap, CX_SITEMAP_SQL),
}
