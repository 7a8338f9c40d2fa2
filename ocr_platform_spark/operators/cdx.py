"""SURT keys + CDX-style capture index — the web-archive lookup layout.

Common-Crawl/Wayback tooling answers "every capture under this domain
(or path prefix)" without scanning the archive by keying captures with
the Sort-friendly URI Reordering Transform (SURT): reverse the host's
labels so the DNS hierarchy becomes a string PREFIX hierarchy —
``https://docs.example.com/a/1?b=2&a=1`` →
``com,example,docs)/a/1?a=1&b=2`` — then sort/partition the index by
that key. A whole registrable domain, subdomains included, is then ONE
contiguous key range (``com,example`` covers bare + www + docs), which
is exactly what a sorted columnar layout turns into file-skipping:
min/max stats + a pushed StartsWith prune the scan to the files holding
the range (pinned in tests/test_cdx.py on a sorted parquet
round-trip).

SURT subset implemented (documented; the pywb convention):
- scheme dropped, host lowercased, ONE leading ``www.`` label
  stripped, port dropped;
- host labels reversed, comma-joined, ``)`` separator;
- path kept verbatim (empty path → ``/``), fragment dropped, query
  params sorted (the dd_url_dedup lesson: param order is re-crawl
  noise), empty query dropped.

Two driver queries over a deterministic messy-capture corpus
synthesized from ``orders`` (multi-host menu incl. a multi-label
ccTLD — ``shop.example.co.uk`` → ``uk,co,example,shop`` — which SURT
deliberately does NOT special-case; param-order variants that must
collapse to one key; per-url re-captures across dates):

- ``cx_cdx_index``: the per-capture index rows (surt, url, captured).
- ``cx_cdx_lookup``: the wayback query — one domain subtree by key
  prefix, latest capture per surt as a MAX-STRUCT AGGREGATE (no
  window; ties resolve to max orderkey).

Scale shape: the index is a projection (zero shuffle); the lookup is
prefix-filter + one map-side-combinable aggregate. Both oracles are
LIVE SQL (DuckDB list_reverse/list_sort mirror the JVM array ops) —
no fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

CDX_CAP = 3000                      # o_orderkey < CDX_CAP captures
LOOKUP_PREFIX = "com,example"       # the example.com subtree


def _capture_urls(orders: DataFrame) -> DataFrame:
    """Deterministic messy captures: host/path/query menus keyed on
    o_orderkey; k DIV 7 groups re-captures of one url across dates."""
    k = F.col("o_orderkey")
    g = (k / 7).cast("long").cast("string")
    host = (F.when(k % 5 == 0, F.lit("www.example.com"))
            .when(k % 5 == 1, F.lit("docs.example.com"))
            .when(k % 5 == 2, F.lit("example.com"))
            .when(k % 5 == 3, F.lit("blog.sample.org"))
            .otherwise(F.lit("shop.example.co.uk")))
    path = (F.when(k % 3 == 0, F.concat(F.lit("/a/"), g))
            .when(k % 3 == 1, F.concat(F.lit("/a/b/"), g))
            .otherwise(F.concat(F.lit("/c/"), g)))
    query = (F.when(k % 4 == 0, F.lit(""))
             .when(k % 4 == 1, F.lit("?b=2&a=1"))
             .when(k % 4 == 2, F.lit("?a=1&b=2"))
             .otherwise(F.lit("?x=9#frag")))
    url = F.concat(F.lit("https://"), host, path, query)
    return orders.select("o_orderkey", "o_orderdate", url.alias("url"))


def surt_key(url: Column) -> Column:
    """Column → SURT key (subset above). Pure JVM regex + array ops."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    host = F.lower(F.regexp_extract(no_frag, r"^[a-zA-Z]+://([^/:?]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(no_frag, r"^[a-zA-Z]+://[^/?]*(/[^?]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    params = F.filter(F.split(q, "&"), lambda p: p != "")
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(rev, F.lit(")"), path,
                    F.when(qs != "", F.concat(F.lit("?"), qs))
                    .otherwise(F.lit("")))


def cdx_index(captures: DataFrame) -> DataFrame:
    return captures.select(
        surt_key(F.col("url")).alias("surt"), "url",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("captured"),
        "o_orderkey")


def cdx_lookup(index: DataFrame, prefix: str) -> DataFrame:
    """Domain-subtree range query + latest capture per surt. The
    prefix is a host-label path (``com,example``); matches must end
    the label at a boundary — ``)`` (the domain itself) or ``,`` (a
    subdomain) — or a bare prefix would also swallow unrelated hosts
    that merely EXTEND the last label (``example-shop.com`` →
    ``com,example-shop)…`` starts with ``com,example``). Two
    StartsWith predicates are still one contiguous stats-prunable
    range each (self-review catch; pinned by test)."""
    hits = index.where(F.col("surt").startswith(prefix + ")")
                       | F.col("surt").startswith(prefix + ","))
    return (hits.groupBy("surt")
            .agg(F.count("*").cast("long").alias("n_captures"),
                 F.max(F.struct(F.col("captured").alias("d"),
                                F.col("o_orderkey").alias("k")))
                 .alias("m"))
            .select("surt", "n_captures",
                    F.col("m.d").alias("latest_capture"),
                    F.col("m.k").alias("kept_orderkey")))


def _index_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < CDX_CAP)
    return cdx_index(_capture_urls(orders))


def cx_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _index_df(spark, sf_dir).select("surt", "url", "captured")


def cx_cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdx_lookup(_index_df(spark, sf_dir), LOOKUP_PREFIX)


_CAPTURES_SQL = f"""
SELECT o_orderkey, o_orderdate,
       'https://' ||
       CASE CAST(o_orderkey % 5 AS INT)
         WHEN 0 THEN 'www.example.com' WHEN 1 THEN 'docs.example.com'
         WHEN 2 THEN 'example.com' WHEN 3 THEN 'blog.sample.org'
         ELSE 'shop.example.co.uk' END ||
       CASE CAST(o_orderkey % 3 AS INT)
         WHEN 0 THEN '/a/' || CAST(o_orderkey // 7 AS VARCHAR)
         WHEN 1 THEN '/a/b/' || CAST(o_orderkey // 7 AS VARCHAR)
         ELSE '/c/' || CAST(o_orderkey // 7 AS VARCHAR) END ||
       CASE CAST(o_orderkey % 4 AS INT)
         WHEN 0 THEN '' WHEN 1 THEN '?b=2&a=1' WHEN 2 THEN '?a=1&b=2'
         ELSE '?x=9#frag' END AS url
FROM orders WHERE o_orderkey < {CDX_CAP}
"""

_SURT_SQL = r"""
  array_to_string(list_reverse(string_split(
      regexp_replace(lower(regexp_extract(
          regexp_replace(url, '#.*$', ''),
          '^[a-zA-Z]+://([^/:?]+)', 1)), '^www\.', ''), '.')), ',')
  || ')' ||
  CASE WHEN regexp_extract(regexp_replace(url, '#.*$', ''),
            '^[a-zA-Z]+://[^/?]*(/[^?]*)?', 1) = ''
       THEN '/'
       ELSE regexp_extract(regexp_replace(url, '#.*$', ''),
            '^[a-zA-Z]+://[^/?]*(/[^?]*)?', 1) END ||
  CASE WHEN array_to_string(list_sort(list_filter(string_split(
           regexp_extract(regexp_replace(url, '#.*$', ''),
                          '\?(.*)$', 1), '&'), p -> p <> '')), '&') <> ''
       THEN '?' || array_to_string(list_sort(list_filter(string_split(
           regexp_extract(regexp_replace(url, '#.*$', ''),
                          '\?(.*)$', 1), '&'), p -> p <> '')), '&')
       ELSE '' END
"""

CX_CDX_INDEX_SQL = f"""
WITH caps AS ({_CAPTURES_SQL})
SELECT {_SURT_SQL} AS surt, url,
       strftime(o_orderdate, '%Y-%m-%d') AS captured
FROM caps
"""

CX_CDX_LOOKUP_SQL = f"""
WITH caps AS ({_CAPTURES_SQL}),
idx AS (
  SELECT {_SURT_SQL} AS surt,
         strftime(o_orderdate, '%Y-%m-%d') AS captured, o_orderkey
  FROM caps)
SELECT surt, count(*) AS n_captures,
       max(struct_pack(d := captured, k := o_orderkey)).d
           AS latest_capture,
       CAST(max(struct_pack(d := captured, k := o_orderkey)).k AS BIGINT)
           AS kept_orderkey
FROM idx WHERE starts_with(surt, '{LOOKUP_PREFIX})')
   OR starts_with(surt, '{LOOKUP_PREFIX},')
GROUP BY surt
"""

QUERIES: dict = {
    # wave 55: SURT/CDX capture index + domain-subtree lookup
    "cx_cdx_index": (cx_cdx_index, CX_CDX_INDEX_SQL),
    "cx_cdx_lookup": (cx_cdx_lookup, CX_CDX_LOOKUP_SQL),
}
