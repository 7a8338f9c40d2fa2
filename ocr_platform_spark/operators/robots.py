"""Robots-exclusion (REP, RFC 9309 subset) crawl-politeness gate.

A crawl→corpus pipeline must honor robots.txt before a page may enter the
corpus at all; the reference ingests from a managed bucket so the concern
never appears there (closest analogue: the URL allow-listing around PDF
ingest, apps/web/src/server/services/ocr.ts) — this is a beyond-reference
operator of the cx_* crawl-governance family (SURVEY.md §2.7).

Semantics implemented (the deployed subset of RFC 9309):

- **group attribution**: a group is one or more consecutive ``User-agent:``
  lines followed by its rules; rules bind to the group they follow, so a
  ``Disallow: /`` under ``User-agent: badbot`` must NOT leak into the
  ``*`` group. Only ``*`` groups are served (we crawl as a generic agent).
- **longest-match wins** across the group's Allow/Disallow rules (literal
  path prefixes; the wildcard-free form, which is the overwhelming
  majority of real rules), **Allow wins length ties** — both per RFC 9309
  §2.2.2.
- full-line ``#`` comments and unknown directives (``Crawl-delay``,
  ``Sitemap``) are ignored; an empty ``Disallow:`` value matches nothing.
- **no robots / no match ⇒ allowed** (never-drop: the verdict is a flag;
  the materializer downstream decides).

Physical shape at scale: robots documents number ~one per HOST — many
orders of magnitude fewer than pages — so the parsed rule table is
broadcast and the page-side scan never shuffles. Parsing itself is pure
JVM column math (split/posexplode/window over ~tens of lines per host);
the per-host line window partitions on host, the same natural key the
fetcher stores robots under. Past ~10^7 hosts the broadcast ceiling
bites; the fallback is the same inner join shuffled on host — still
page-count-proportional, never pair-proportional.

Oracle independence: the DuckDB side never parses robots.txt — it
re-derives every verdict from the rule-generation formula directly, so a
Spark-side parsing bug (group leakage, wrong tie-break, comment handling)
cannot cancel out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

N_HOSTS = 16


def robots_corpus(spark: SparkSession) -> DataFrame:
    """Deterministic per-host robots.txt documents (host h{k}.example.net,
    k in [0, N_HOSTS)). Every host carries a decoy ``badbot`` group whose
    ``Disallow: /`` must not apply to ``*``; k%3==0 hosts add the
    longest-match/allow-tie pair; k%5==0 hosts disallow everything."""
    k = F.col("id")
    lines = F.array(
        F.lit("# synthetic crawl policy"),
        F.lit("User-agent: badbot"),
        F.lit("Disallow: /"),            # must bind to badbot only
        F.lit(""),
        F.lit("User-agent: *"),
        F.lit("Crawl-delay: 5"),         # unknown directive: ignored
        F.lit("Disallow: /private/"),
        F.when(k % 3 == 0, F.lit("Disallow: /p/")),
        F.when(k % 3 == 0, F.lit("Allow: /p/open/")),
        F.when(k % 5 == 0, F.lit("Disallow: /")),
        F.lit("Disallow:"),              # empty value: matches nothing
    )
    return spark.range(N_HOSTS).select(
        F.concat(F.lit("h"), k.cast("string"), F.lit(".example.net"))
        .alias("host"),
        F.concat_ws("\n", F.filter(lines, lambda x: x.isNotNull()))
        .alias("robots_txt"))


def parse_robots(robots: DataFrame) -> DataFrame:
    """(host, robots_txt) → one row per ``*``-group rule:
    (host, allow:int, path, plen). Group attribution per RFC 9309: runs of
    consecutive User-agent lines open a group; rules bind to the last open
    group; a group is served iff one of its agents is ``*``."""
    lines = robots.select(
        "host",
        F.posexplode(F.split("robots_txt", "\n")).alias("line_no", "raw"))
    line = F.trim(F.col("raw"))
    directive = F.lower(F.trim(F.substring_index(line, ":", 1)))
    value = F.trim(F.expr(
        "substring(trim(raw), instr(trim(raw), ':') + 1)"))
    parsed = (lines
              .filter((line != "") & ~line.startswith("#")
                      & line.contains(":"))
              .select("host", "line_no", directive.alias("directive"),
                      value.alias("value")))

    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = (F.col("directive") == "user-agent").cast("int")
    grouped = (parsed
               .withColumn("is_ua", is_ua)
               # a UA line NOT preceded by a UA line opens a new group
               .withColumn(
                   "new_group",
                   (F.col("is_ua").cast("boolean")
                    & (F.coalesce(F.lag("is_ua").over(w), F.lit(0)) == 0))
                   .cast("int"))
               .withColumn("group_idx", F.sum("new_group").over(w)))
    star = (grouped
            .filter(F.col("is_ua") == 1)
            .groupBy("host", "group_idx")
            .agg(F.max((F.col("value") == "*").cast("int")).alias("star")))
    rules = (grouped
             .filter(F.col("directive").isin("allow", "disallow")
                     & (F.col("value") != ""))
             .join(star, ["host", "group_idx"])
             .filter(F.col("star") == 1)
             .select("host",
                     (F.col("directive") == "allow").cast("int")
                     .alias("allow"),
                     F.col("value").alias("path"),
                     F.length("value").alias("plen")))
    return rules


def _urls(orders: DataFrame) -> DataFrame:
    """Deterministic URL table over orders (the cx_url_filter shape, with
    paths exercising every rule family)."""
    o = F.col("o_orderkey")
    path = (F.when(o % 7 == 0,
                   F.concat(F.lit("/private/doc"), o.cast("string")))
            .when(o % 7 == 1,
                  F.concat(F.lit("/p/open/"), o.cast("string")))
            .otherwise(F.concat(F.lit("/p/"), o.cast("string"))))
    host = F.concat(F.lit("h"), (o % N_HOSTS).cast("string"),
                    F.lit(".example.net"))
    return orders.select(
        "o_orderkey", host.alias("host"), path.alias("path"),
        F.concat(F.lit("https://"), host, path).alias("url"))


def cx_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-politeness verdict per URL: parse the host's robots.txt,
    apply longest-match / allow-wins-ties over the ``*`` group, default
    allow (never-drop: the verdict is a flag). The parsed rules collapse
    to ONE array row per host (tiny), broadcast into a 1:1 equi-join; the
    best match is ``array_max`` over the prefix-matching subset — struct
    order (plen, allow) IS longest-match-then-allow-wins — so the URL
    side is a pure projection: no fan-out, no re-aggregation, zero
    exchanges above its scan."""
    urls = _urls(load(spark, sf_dir, "orders")
                 .filter(F.col("o_orderkey") < 3000))
    j = urls.join(F.broadcast(rules_by_host(spark)), "host", "left")
    b = F.col("best")
    return (j.withColumn("best", best_match(F.col("path")))
            .select(
                "o_orderkey", "url", "host",
                b["rpath"].alias("matched_rule"),
                b["allow"].alias("rule_is_allow"),
                F.when(b.isNull(), F.lit(True)).otherwise(b["allow"] == 1)
                .alias("allowed")))


def rules_by_host(spark: SparkSession) -> DataFrame:
    """Parsed * rules collapsed to ONE array row per host — the broadcast
    unit every politeness consumer (URL gate, sitemap seeder) joins on."""
    return (parse_robots(robots_corpus(spark))
            .groupBy("host")
            .agg(F.collect_list(
                F.struct(F.col("plen"), F.col("allow"),
                         F.col("path").alias("rpath"))).alias("rules")))


def best_match(path):
    """Longest-match / allow-wins-ties over a joined ``rules`` array:
    struct order (plen, allow) IS the RFC 9309 tie-break."""
    return F.array_max(F.filter(
        "rules", lambda r: path.startswith(r["rpath"])))


CX_ROBOTS_SQL = """
WITH urls AS (
  SELECT o_orderkey,
         o_orderkey % 16 AS hk,
         CASE WHEN o_orderkey % 7 = 0 THEN '/private/doc' || o_orderkey
              WHEN o_orderkey % 7 = 1 THEN '/p/open/' || o_orderkey
              ELSE '/p/' || o_orderkey END AS path
  FROM orders WHERE o_orderkey < 3000
), judged AS (
  -- longest-match re-derived from the generation formula, NOT by parsing:
  -- /private/ (len 9, disallow) > /p/open/ (8, allow) > /p/ (3, disallow)
  -- > / (1, disallow); allow wins ties (none arise: lengths are distinct)
  SELECT o_orderkey, hk, path,
    CASE WHEN path LIKE '/private/%' THEN '/private/'
         WHEN hk % 3 = 0 AND path LIKE '/p/open/%' THEN '/p/open/'
         WHEN hk % 3 = 0 AND path LIKE '/p/%' THEN '/p/'
         WHEN hk % 5 = 0 THEN '/'
         ELSE NULL END AS matched_rule,
    CASE WHEN path LIKE '/private/%' THEN 0
         WHEN hk % 3 = 0 AND path LIKE '/p/open/%' THEN 1
         WHEN hk % 3 = 0 AND path LIKE '/p/%' THEN 0
         WHEN hk % 5 = 0 THEN 0
         ELSE NULL END AS rule_is_allow
  FROM urls)
SELECT o_orderkey,
       'https://h' || hk || '.example.net' || path AS url,
       'h' || hk || '.example.net' AS host,
       matched_rule,
       CAST(rule_is_allow AS INTEGER) AS rule_is_allow,
       COALESCE(rule_is_allow = 1, TRUE) AS allowed
FROM judged
"""


QUERIES: dict = {
    "cx_robots_filter": (cx_robots_filter, CX_ROBOTS_SQL),
}
