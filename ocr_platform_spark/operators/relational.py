"""Relational operator set (SURVEY.md §2.3 R1-R20) over the testdata tables.

Each entry is ``name → (spark_fn, oracle_sql)`` where spark_fn(spark, sf_dir)
returns a DataFrame and oracle_sql is the DuckDB-equivalent ANSI SQL. Every
computed column is aliased identically on both sides (the driver hashes
values after sorting columns by name).

Money/quantity values are emitted as floor-scaled BIGINT (``*_cents`` /
``*_x100``): ``floor(x * 100)`` on the raw double is bit-identical in Spark
and DuckDB (pure IEEE ops, no rounding-mode choice), and integer sums are
exact and order-independent — unlike CAST(.. AS DECIMAL) whose half-way
rounding rule differs between the engines (HALF_UP vs round-half-even),
which is what broke the round-1 value-hashes on r01/r08/r09/r11/r17.

Reference provenance for each operator is cited in SURVEY.md §2.3 (Prisma
call sites in apps/web/src/server/ and apps/web/src/app/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

def _cents(col: str) -> F.Column:
    """floor(x*100) as BIGINT — hash-stable money representation (both
    engines evaluate the identical IEEE double expression)."""
    return F.floor(F.col(col) * 100).cast("long")


# --- R1+R2: projection + equality filter (ref page.ts:24-68) --------------
def r01_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_quantity") == 30) & (F.col("l_returnflag") == "R"))
            .select("l_orderkey", "l_linenumber", "l_partkey",
                    _cents("l_extendedprice").alias("price_cents")))


R01_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey,
       CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents
FROM lineitem WHERE l_quantity = 30 AND l_returnflag = 'R'
"""


# --- R2: composite equality filter (ref page.ts:24-39) --------------------
def r02_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pdfPageNumber = n AND Book.id = b` shape: two equality predicates,
    both pushed to the parquet scan (PushedFilters in .explain)."""
    li = load(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_orderkey") % 100 == 0) & (F.col("l_linenumber") == 1))
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))


R02_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
FROM lineitem WHERE l_orderkey % 100 = 0 AND l_linenumber = 1
"""


# --- R3/R4: case-insensitive contains (ref book.ts:13-25) -----------------
def r03_ilike_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (part.filter(F.col("p_name").ilike("%RED%") |
                        F.col("p_name").ilike("%blue%"))
            .select("p_partkey", "p_name", "p_brand"))


R03_SQL = """
SELECT p_partkey, p_name, p_brand FROM part
WHERE p_name ILIKE '%RED%' OR p_name ILIKE '%blue%'
"""


# --- R4: contains-vs-exact mode switch (ref lib/pagination.ts:18-29) ------
def _name_predicate(q: str, mode: str):
    """Parameterized predicate builder — the queryMode switch applied in
    texts/page.tsx:38-56."""
    col = F.col("p_name")
    if mode == "exact":
        return F.lower(col) == q.lower()
    return col.ilike(f"%{q}%")


def r04_exact_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (part.filter(_name_predicate("red widget", "exact") |
                        _name_predicate("BLUE BOLT", "exact"))
            .select("p_partkey", "p_name"))


R04_SQL = """
SELECT p_partkey, p_name FROM part
WHERE lower(p_name) = 'red widget' OR lower(p_name) = 'blue bolt'
"""


# --- R5: IN-list / semi join access control (ref page.ts:28-38) -----------
def r05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    asia_nations = (nat.join(F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
                             nat.n_regionkey == reg.r_regionkey, "left_semi"))
    return (cust.join(F.broadcast(asia_nations),
                      cust.c_nationkey == asia_nations.n_nationkey, "left_semi")
            .select("c_custkey", "c_name", "c_nationkey"))


R05_SQL = """
SELECT c_custkey, c_name, c_nationkey FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
"""


# --- R6: anti join / NULL filter (ref book.ts:12, texts/page.tsx:79-86) ---
def r06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO high-value order — the `none: {}` Prisma shape."""
    cust = load(spark, sf_dir, "customer")
    big = (load(spark, sf_dir, "orders")
           .filter(F.col("o_totalprice") > 450000))
    return (cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
            .select("c_custkey", "c_name", "c_mktsegment"))


R06_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
"""


# --- R7: existence semi join through a bridge (ref texts/page.tsx:61-107) -
def r07_bridge_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    rich_nations = (cust.filter(F.col("c_acctbal") > 9000)
                    .select("c_nationkey").distinct())
    return (supp.join(F.broadcast(rich_nations),
                      supp.s_nationkey == rich_nations.c_nationkey, "left_semi")
            .select("s_suppkey", "s_name", "s_nationkey"))


R07_SQL = """
SELECT s_suppkey, s_name, s_nationkey FROM supplier
WHERE s_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
"""


# --- R8: 1:N join + fan-out aggregate (ref review/[bookId]/page.tsx:30-59)
def r08_join_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(_cents("l_quantity")).alias("sum_qty_x100"))
    return (orders.filter(F.col("o_orderstatus") == "F")
            .join(per_order, orders.o_orderkey == per_order.l_orderkey)
            .select("o_orderkey", "o_custkey", "n_lines", "sum_qty_x100"))


R08_SQL = """
SELECT o_orderkey, o_custkey, count(*) AS n_lines,
       CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_x100
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderkey, o_custkey
"""


# --- R9: broadcast hash join (ref review/[bookId]/page.tsx:68-86) ---------
def r09_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_items"),
                 F.sum(_cents("l_extendedprice")).alias("revenue_cents")))


R09_SQL = """
SELECT p_brand, count(*) AS n_items,
       CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --- R10: unique-key point lookup (ref book.ts:44-52) ---------------------
def r10_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (orders.filter(F.col("o_orderkey") == 7)
            .select("o_orderkey", "o_custkey", "o_orderstatus",
                    _cents("o_totalprice").alias("total_cents")))


R10_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders WHERE o_orderkey = 7
"""


# --- R11: sum aggregation, TPC-H Q1 shape (ref book.ts:149-168) -----------
def r11_sum_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # all-integer arithmetic: cents x percent → x10000 units; exact and
    # order-independent, so the value-hash cannot diverge from DuckDB
    disc = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(_cents("l_quantity")).alias("sum_qty_x100"),
                 F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
                 F.sum(disc).alias("sum_disc_x10k"),
                 F.count("*").alias("n_rows")))


R11_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_x100,
       CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_x10k,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- R12: count aggregation (ref texts/page.tsx:109-112) ------------------
def r12_count_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(F.count("*").alias("n_customers"))


R12_SQL = "SELECT c_mktsegment, count(*) AS n_customers FROM customer GROUP BY c_mktsegment"


# --- R13: stable sort w/ tiebreak (ref texts/page.tsx:190-197) ------------
def r13_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY o_orderdate DESC, o_orderkey DESC — the createdAt/id stable
    tiebreak; top-k via limit keeps the sort a TakeOrdered (no full sort)."""
    orders = load(spark, sf_dir, "orders")
    return (orders.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
            .limit(50)
            .select("o_orderkey", "o_orderdate", "o_orderstatus"))


R13_SQL = """
SELECT o_orderkey, o_orderdate, o_orderstatus FROM orders
ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 50
"""


# --- R13+R14: stable sort + pagination (ref texts/page.tsx:190-199) -------
def r14_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page k of a sorted listing WITHOUT a global window: top-(page*size)
    via orderBy().limit() — Catalyst plans TakeOrderedAndProject, a
    per-partition top-k merge, never a single-partition sort of the whole
    table — then row_number over only those page*size rows. The round-1
    global Window.orderBy plan moved the entire orders table to ONE
    partition (WindowExec 'No Partition Defined'), a 100x-scale killer."""
    orders = load(spark, sf_dir, "orders")
    page, size = 2, 20
    top = (orders.orderBy(F.desc("o_totalprice"), F.desc("o_orderkey"))
           .limit(page * size)
           .select("o_orderkey", "o_totalprice"))
    w = Window.orderBy(F.desc("o_totalprice"), F.desc("o_orderkey"))
    return (top.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") > (page - 1) * size)
            .select("rn", "o_orderkey",
                    _cents("o_totalprice").alias("total_cents")))


R14_SQL = """
SELECT rn, o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents
FROM (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders) t
WHERE rn > 20 AND rn <= 40
"""


# --- R15: numeric sort of string ids (ref texts.airtable.ts:106) ----------
def r15_numeric_string_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    ids = orders.select(F.col("o_orderkey").cast("string").alias("id"))
    return (ids.orderBy(F.col("id").cast("long")).limit(25)
            .select("id"))


R15_SQL = """
SELECT CAST(o_orderkey AS VARCHAR) AS id FROM orders
ORDER BY CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) LIMIT 25
"""


# --- R16: distinct / set dedup (ref page.ts:188) --------------------------
def r16_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return cust.select("c_nationkey", "c_mktsegment").distinct()


R16_SQL = "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer"


# --- R17: derived counters, never mutated (ref page.ts:168-184) -----------
def r17_derived_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (orders.groupBy("o_custkey")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(_cents("o_totalprice")).alias("lifetime_cents")))


R17_SQL = """
SELECT o_custkey, count(*) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS lifetime_cents
FROM orders GROUP BY o_custkey
"""


# --- R18: conditional state transition (ref page.ts:175-183) --------------
def r18_status_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    status = (F.when(F.col("n_orders") >= 15, "COMPLETED")
              .when(F.col("n_orders") >= 8, "IN_REVIEW")
              .otherwise("PROCESSING"))
    return agg.select("o_custkey", "n_orders", status.alias("status"))


R18_SQL = """
SELECT o_custkey, count(*) AS n_orders,
       CASE WHEN count(*) >= 15 THEN 'COMPLETED'
            WHEN count(*) >= 8 THEN 'IN_REVIEW'
            ELSE 'PROCESSING' END AS status
FROM orders GROUP BY o_custkey
"""


# --- R19: pivot/reshape (ref localization.ts:1-19, texts/page.tsx:203-239)
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def r19_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (ev.filter(F.col("user_id") < 50)
            .groupBy("user_id")
            .pivot("event_type", EVENT_TYPES)
            .agg(F.count(F.lit(1)))
            .na.fill(0, EVENT_TYPES))


R19_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS "click",
       count(*) FILTER (event_type = 'view')     AS "view",
       count(*) FILTER (event_type = 'purchase') AS "purchase",
       count(*) FILTER (event_type = 'signup')   AS "signup",
       count(*) FILTER (event_type = 'error')    AS "error"
FROM events WHERE user_id < 50 GROUP BY user_id
"""


# --- R20: unique-slug suffixing via window (ref services/usul/book.ts:5-31)
def r20_slug_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        F.lower(F.regexp_replace("c_mktsegment", "[^A-Za-z0-9]+", "-"))
        .alias("slug"))
    w = Window.partitionBy("slug").orderBy("c_custkey")
    rn = F.row_number().over(w)
    return base.select(
        "c_custkey",
        F.when(rn > 1, F.concat_ws("-", "slug", (rn - 1).cast("string")))
        .otherwise(F.col("slug")).alias("slug"))


R20_SQL = """
SELECT c_custkey,
       CASE WHEN rn > 1 THEN slug || '-' || CAST(rn - 1 AS VARCHAR)
            ELSE slug END AS slug
FROM (
  SELECT c_custkey,
         lower(regexp_replace(c_mktsegment, '[^A-Za-z0-9]+', '-', 'g')) AS slug,
         row_number() OVER (
           PARTITION BY lower(regexp_replace(c_mktsegment, '[^A-Za-z0-9]+', '-', 'g'))
           ORDER BY c_custkey) AS rn
  FROM customer) t
"""


# --- R21: corrections overlay (ref entry point B) -------------------------
def r21_corrections_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The review-loop read path: ``extracted LEFT JOIN corrections`` with
    ``coalesce(corrected, extracted)`` — mirroring `page.content ??
    page.ocrContent` (apps/web/src/app/app/[bookId]/[pageNumber]/
    page.tsx:205) — plus flags set-union (page.ts:187-188) and word-recount
    on override (page.ts:196-202). Corrections are synthesized
    deterministically from the documents table (every 10th doc corrected);
    at scale the corrections side is the small human-edited table and the
    join broadcasts it."""
    from ocr_platform_spark.functions.spark_udfs import count_words_udf

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.array(F.lit("NEEDS_ADDITIONAL_REVIEW")))
        .otherwise(F.array().cast("array<string>")).alias("flags"))
    corrections = (docs.filter(F.col("doc_id") % 10 == 0)
                   .select("doc_id",
                           F.concat(F.lit("CORRECTED: "), F.col("text"))
                           .alias("corrected_text"),
                           F.array(F.lit("REVIEWED")).alias("c_flags")))
    joined = base.join(F.broadcast(corrections), "doc_id", "left")
    content = F.coalesce("corrected_text", "text")
    flags = F.array_sort(F.array_distinct(F.concat(
        F.col("flags"), F.coalesce("c_flags", F.array().cast("array<string>")))))
    return joined.select(
        "doc_id", content.alias("content"),
        F.col("corrected_text").isNotNull().alias("reviewed"),
        F.array_join(flags, ",").alias("flags"),
        count_words_udf(content).alias("total_words"))


R21_SQL = r"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 7 = 0 THEN ['NEEDS_ADDITIONAL_REVIEW']
              ELSE CAST([] AS VARCHAR[]) END AS flags
  FROM documents),
corrections AS (
  SELECT doc_id, 'CORRECTED: ' || text AS corrected_text,
         ['REVIEWED'] AS c_flags
  FROM documents WHERE doc_id % 10 = 0)
SELECT b.doc_id,
       coalesce(c.corrected_text, b.text) AS content,
       c.corrected_text IS NOT NULL AS reviewed,
       coalesce(array_to_string(list_sort(list_distinct(
           b.flags || coalesce(c.c_flags, CAST([] AS VARCHAR[])))), ','),
                '') AS flags,
       CAST(len(regexp_extract_all(coalesce(c.corrected_text, b.text),
                                   '[\p{L}\p{M}\p{N}]+')) AS INTEGER) AS total_words
FROM base b LEFT JOIN corrections c ON b.doc_id = c.doc_id
"""


# --- R22: composed catalog page (ref entry point C, texts/page.tsx:31-201)
def r22_catalog_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's busiest page as ONE plan: ilike-OR search filter +
    bridge semi-join (region access) + anti-join (none:{}) + parallel
    COUNT + page-k pagination + localized-name pivot. Joins broadcast the
    small side; pagination is the r14 top-k pattern (no global window over
    the full table); the count rides along as a 1-row broadcast."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")

    asia_nations = nat.join(
        F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
        nat.n_regionkey == reg.r_regionkey, "left_semi")
    asia_supp = supp.join(F.broadcast(asia_nations),
                          supp.s_nationkey == asia_nations.n_nationkey,
                          "left_semi")
    # .distinct() on the build sides is deliberate: lineitem partkeys
    # repeat ~30x, so the map-side partial agg shrinks what the semi/anti
    # join must broadcast/shuffle by that factor — worth one shuffle of
    # unique keys at any scale
    asia_parts = (li.join(F.broadcast(asia_supp),
                          li.l_suppkey == asia_supp.s_suppkey, "left_semi")
                  .select("l_partkey").distinct())
    heavy_parts = (li.filter(F.col("l_quantity") > 49)
                   .select("l_partkey").distinct())
    qualifying = (part.filter(F.col("p_name").ilike("%red%")
                              | F.col("p_name").ilike("%blue%"))
                  .join(asia_parts, part.p_partkey == asia_parts.l_partkey,
                        "left_semi")
                  .join(heavy_parts, part.p_partkey == heavy_parts.l_partkey,
                        "left_anti")
                  .select("p_partkey", "p_name"))
    total = qualifying.agg(F.count("*").alias("total_count"))

    page, size = 2, 15
    top = qualifying.orderBy(F.desc("p_partkey")).limit(page * size)
    w = Window.orderBy(F.desc("p_partkey"))
    sel = (top.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") > (page - 1) * size))
    loc = sel.select(
        "p_partkey", "rn",
        F.explode(F.array(
            F.struct(F.lit("ar").alias("locale"),
                     F.concat(F.lit("اسم "), F.col("p_name")).alias("txt")),
            F.struct(F.lit("en").alias("locale"),
                     F.col("p_name").alias("txt")))).alias("l"))
    pivoted = (loc.select("p_partkey", "rn", "l.locale", "l.txt")
               .groupBy("p_partkey", "rn")
               .pivot("locale", ["ar", "en"])
               .agg(F.first("txt"))
               .withColumnRenamed("ar", "name_ar")
               .withColumnRenamed("en", "name_en"))
    return pivoted.join(F.broadcast(total))


R22_SQL = """
WITH qualifying AS (
  SELECT p_partkey, p_name FROM part
  WHERE (p_name ILIKE '%red%' OR p_name ILIKE '%blue%')
    AND p_partkey IN (
      SELECT l_partkey FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
    AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)),
sel AS (
  SELECT p_partkey, p_name, rn FROM (
    SELECT p_partkey, p_name,
           row_number() OVER (ORDER BY p_partkey DESC) AS rn
    FROM qualifying) t
  WHERE rn > 15 AND rn <= 30),
loc AS (
  SELECT p_partkey, rn, 'ar' AS locale, 'اسم ' || p_name AS txt FROM sel
  UNION ALL
  SELECT p_partkey, rn, 'en' AS locale, p_name AS txt FROM sel)
SELECT p_partkey, rn,
       max(CASE WHEN locale = 'ar' THEN txt END) AS name_ar,
       max(CASE WHEN locale = 'en' THEN txt END) AS name_en,
       (SELECT count(*) FROM qualifying) AS total_count
FROM loc GROUP BY p_partkey, rn
"""


QUERIES: dict = {
    "r01_projection_filter": (r01_projection_filter, R01_SQL),
    "r02_equality_filter": (r02_equality_filter, R02_SQL),
    "r03_ilike_contains": (r03_ilike_contains, R03_SQL),
    "r04_exact_mode": (r04_exact_mode, R04_SQL),
    "r05_semi_join": (r05_semi_join, R05_SQL),
    "r06_anti_join": (r06_anti_join, R06_SQL),
    "r07_bridge_semi": (r07_bridge_semi, R07_SQL),
    "r08_join_fanout": (r08_join_fanout, R08_SQL),
    "r09_broadcast_join": (r09_broadcast_join, R09_SQL),
    "r10_point_lookup": (r10_point_lookup, R10_SQL),
    "r11_sum_agg": (r11_sum_agg, R11_SQL),
    "r12_count_agg": (r12_count_agg, R12_SQL),
    "r13_sort": (r13_sort, R13_SQL),
    "r14_pagination": (r14_pagination, R14_SQL),
    "r15_numeric_string_sort": (r15_numeric_string_sort, R15_SQL),
    "r16_distinct": (r16_distinct, R16_SQL),
    "r17_derived_counters": (r17_derived_counters, R17_SQL),
    "r18_status_transition": (r18_status_transition, R18_SQL),
    "r19_pivot": (r19_pivot, R19_SQL),
    "r20_slug_dedup": (r20_slug_dedup, R20_SQL),
    "r21_corrections_overlay": (r21_corrections_overlay, R21_SQL),
    "r22_catalog_page": (r22_catalog_page, R22_SQL),
}
