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


def _path_for(k) -> F.Column:
    """Deterministic path for an integer key: every rule family appears
    (k%7==0 → /private/, k%7==1 → /p/open/, else /p/)."""
    return (F.when(k % 7 == 0,
                   F.concat(F.lit("/private/doc"), k.cast("string")))
            .when(k % 7 == 1,
                  F.concat(F.lit("/p/open/"), k.cast("string")))
            .otherwise(F.concat(F.lit("/p/"), k.cast("string"))))


def _host_for(k) -> F.Column:
    return F.concat(F.lit("h"), (k % N_HOSTS).cast("string"),
                    F.lit(".example.net"))


def _urls(orders: DataFrame) -> DataFrame:
    """Deterministic URL table over orders (the cx_url_filter shape, with
    paths exercising every rule family)."""
    o = F.col("o_orderkey")
    path, host = _path_for(o), _host_for(o)
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


EDGE_KEYS = 3000       # link-graph key space (== cx_robots_filter's urls)
CRAWLED_KEYS = 1500    # keys below this are already-extracted pages
FRONTIER_CAP = 5       # politeness budget: fetches per host per wave


def cx_polite_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl scheduler's operational query — frontier × robots in one
    plan: synthesize the outlink graph over orders (edge o → key
    ``(o·((o%97)+1)+3) mod 3000``, chosen so every host and every rule
    family appears with varied inbound multiplicity), drop targets whose
    URL is already in the crawled set, gate the survivors through the
    RFC 9309 verdict, and emit the next wave capped at FRONTIER_CAP
    fetches per host, ranked by inbound count (ties → target byte order).

    Composition is the point: cx_frontier's discovery/anti-join/cap and
    cx_robots_filter's broadcast-rules verdict, chained the way the real
    scheduler runs them. Shape at scale: inbound aggregation happens on
    the INTEGER key before any string is built (presentation columns are
    derived after the ≤|keys| aggregate, not carried through the
    shuffle); the crawled-set anti-join keys on the url string — bloom-
    filter / storage-partitioned territory at corpus scale; the robots
    join is the same ONE-row-per-host broadcast as cx_robots_filter, so
    the verdict adds zero exchanges; the politeness window runs over the
    already-tiny frontier. Oracle: pure SQL — re-derives edges, crawled
    membership, verdicts, and the cap from the generation formulas
    without parsing robots.txt or building a link table."""
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < EDGE_KEYS)
    o = F.col("o_orderkey")
    tk = F.pmod(o * (F.pmod(o, F.lit(97)) + 1) + 3, F.lit(EDGE_KEYS))
    cand = (orders.select(tk.alias("tk"))
            .groupBy("tk").agg(F.count("*").alias("inbound")))
    k = F.col("tk")
    host, path = _host_for(k), _path_for(k)
    parts = cand.select(
        "tk", "inbound", host.alias("host"), path.alias("path"),
        F.concat(F.lit("https://"), host, path).alias("target"))
    crawled = (_urls(orders.filter(o < CRAWLED_KEYS))
               .select(F.col("url").alias("target")))
    fresh = parts.join(crawled, "target", "left_anti")
    j = fresh.join(F.broadcast(rules_by_host(spark)), "host", "left")
    b = F.col("best")
    judged = (j.withColumn("best", best_match(F.col("path")))
              .withColumn("allowed",
                          F.when(b.isNull(), F.lit(True))
                          .otherwise(b["allow"] == 1)))
    w = Window.partitionBy("host").orderBy(
        F.desc("inbound"), F.asc("target"))
    return (judged.filter("allowed")
            .withColumn("fetch_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("fetch_rank") <= FRONTIER_CAP)
            .select("host", "target", F.col("inbound").cast("long")
                    .alias("inbound"),
                    b["rpath"].alias("matched_rule"), "fetch_rank"))


CX_POLITE_FRONTIER_SQL = """
WITH edges AS (
  SELECT (o_orderkey * ((o_orderkey % 97) + 1) + 3) % 3000 AS tk
  FROM orders WHERE o_orderkey < 3000
), cand AS (
  SELECT tk, CAST(COUNT(*) AS BIGINT) AS inbound FROM edges GROUP BY tk
), fresh AS (
  -- crawled membership re-derived from injectivity of the url formula:
  -- url(k) embeds k verbatim, so url IN crawled  <=>  tk < 1500
  SELECT * FROM cand WHERE tk >= 1500
), parts AS (
  SELECT tk, inbound, tk % 16 AS hk,
         CASE WHEN tk % 7 = 0 THEN '/private/doc' || tk
              WHEN tk % 7 = 1 THEN '/p/open/' || tk
              ELSE '/p/' || tk END AS path
  FROM fresh
), judged AS (
  -- verdict re-derived from the rule-generation formula, NOT by parsing
  SELECT tk, inbound, hk,
         'h' || hk || '.example.net' AS host,
         'https://h' || hk || '.example.net' || path AS target,
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
  FROM parts
), ranked AS (
  SELECT host, target, inbound, matched_rule,
         CAST(row_number() OVER (
             PARTITION BY host
             ORDER BY inbound DESC, target ASC) AS BIGINT) AS fetch_rank
  FROM judged WHERE COALESCE(rule_is_allow = 1, TRUE)
)
SELECT host, target, inbound, matched_rule, fetch_rank
FROM ranked WHERE fetch_rank <= 5
"""


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
    "cx_polite_frontier": (cx_polite_frontier, CX_POLITE_FRONTIER_SQL),
}
