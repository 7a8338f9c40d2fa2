"""Scalar / string / date function queries (SURVEY.md §2.4 F1-F13) over the
testdata tables, each paired with its DuckDB oracle.

Python-only semantics (F1 Unicode classes, F2 NFD, F7 fuzzy score) run as
Arrow-batched pandas UDFs; everything else is JVM-side column math. Where a
DuckDB equivalent exists it is asserted; F7 (no SQL equivalent) is
fixture-oracled against the pure-Python scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.functions.spark_udfs import (
    count_words_udf, command_score_udf, hijri_year_col, slug_udf,
    to_arabic_digits_col,
)
from ocr_platform_spark.operators.registry import fixture_sql as _fixture_sql
from ocr_platform_spark.operators.tables import load


# --- F1: Unicode word count (ref apps/web/src/lib/page.ts:3-10) -----------
def f01_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", count_words_udf("text").alias("n_words"))


F01_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[\p{L}\p{M}\p{N}]+')) AS INTEGER) AS n_words
FROM documents
"""


# --- F2: textToSlug (ref apps/web/src/lib/slug.ts:3-12) -------------------
def f02_slug(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select("p_partkey", slug_udf("p_name").alias("slug"))


# p_name is ASCII ([a-z ]) so NFD-strip is the identity and slugify reduces
# to lower + non-alnum runs → '-' (the Python path is still the full NFD
# pipeline; goldens with Arabic diacritics cover the non-ASCII behavior).
F02_SQL = """
SELECT p_partkey,
       trim(regexp_replace(lower(p_name), '[^a-z0-9_]+', '-', 'g'), '-') AS slug
FROM part
"""


# --- F3: hijri year (ref apps/web/src/lib/hijri.ts:3-122) -----------------
def f03_hijri(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    years = orders.select(F.year("o_orderdate").alias("greg_year")).distinct()
    return years.select("greg_year",
                        hijri_year_col(F.col("greg_year")).alias("hijri_year"))


F03_SQL = """
SELECT greg_year, 30 * cyc
       + CAST(floor((z - 10631 * cyc - 8.01 / 60.0) / (10631.0 / 30.0)) AS BIGINT)
       AS hijri_year
FROM (
  SELECT greg_year, z, CAST(floor(z / 10631.0) AS BIGINT) AS cyc FROM (
    SELECT greg_year,
           CAST(floor(365.25 * (greg_year - 1 + 4716)) AS BIGINT) + 428 + 1
           + 2 - CAST(floor((greg_year - 1) / 100.0) AS BIGINT)
           + CAST(floor(floor((greg_year - 1) / 100.0) / 4.0) AS BIGINT)
           - 1524 - 1948084 AS z
    FROM (SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS greg_year
          FROM orders) y) j) c
"""


# --- F4: digit translation (ref arabic-numbers-extension.ts:36-121) -------
def f04_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (orders.filter(F.col("o_orderkey") < 400)
            .select("o_orderkey",
                    to_arabic_digits_col(F.col("o_orderkey").cast("string"))
                    .alias("eastern")))


F04_SQL = """
SELECT o_orderkey,
       translate(CAST(o_orderkey AS VARCHAR), '0123456789', '٠١٢٣٤٥٦٧٨٩') AS eastern
FROM orders WHERE o_orderkey < 400
"""


# --- F5: transliteration output normalization (ref transliterate.ts:140-142)
def f05_translit_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replace modifier-letter turned comma `ʻ` with `ʿ` (ayn) and straight
    apostrophe with `ʾ` (hamza) — exact 1:1 codepoint mapping."""
    cust = load(spark, sf_dir, "customer")
    raw = F.concat(F.lit("ʻAbd al-"), F.col("c_name"), F.lit("'s text"))
    return (cust.filter(F.col("c_custkey") < 250)
            .select("c_custkey",
                    F.translate(raw, "ʻ'", "ʿʾ").alias("normalized")))


F05_SQL = """
SELECT c_custkey,
       replace(replace('ʻAbd al-' || c_name || '''s text', 'ʻ', 'ʿ'),
               '''', 'ʾ') AS normalized
FROM customer WHERE c_custkey < 250
"""


# --- F6: publishing-details extraction (ref extract-publishing-details.ts)
def f06_publishing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    details = F.concat(
        F.lit("المحقق: "), F.col("c_name"),
        F.lit(" / دار النشر: دار الكتب / رقم الطبعة: "),
        (F.col("c_custkey") % 5 + 1).cast("string"),
        F.lit(" / سنة النشر: "),
        (F.col("c_custkey") % 300 + 1100).cast("string"), F.lit("هـ"))
    ext = cust.filter(F.col("c_custkey") < 200).select(
        "c_custkey", details.alias("details"))
    return ext.select(
        "c_custkey",
        F.regexp_extract("details", "المحقق: ([^/]+?) /", 1).alias("editor"),
        F.regexp_extract("details", "رقم الطبعة: ([0-9]+)", 1).cast("int")
        .alias("edition"),
        F.regexp_extract("details", "سنة النشر: ([0-9]{3,4})هـ", 1).cast("int")
        .alias("year_hijri"))


F06_SQL = """
WITH built AS (
  SELECT c_custkey,
         'المحقق: ' || c_name || ' / دار النشر: دار الكتب / رقم الطبعة: '
         || CAST(c_custkey % 5 + 1 AS VARCHAR) || ' / سنة النشر: '
         || CAST(c_custkey % 300 + 1100 AS VARCHAR) || 'هـ' AS details
  FROM customer WHERE c_custkey < 200)
SELECT c_custkey,
       regexp_extract(details, 'المحقق: ([^/]+?) /', 1) AS editor,
       CAST(regexp_extract(details, 'رقم الطبعة: ([0-9]+)', 1) AS INTEGER) AS edition,
       CAST(regexp_extract(details, 'سنة النشر: ([0-9]{3,4})هـ', 1) AS INTEGER) AS year_hijri
FROM built
"""


# --- F7: commandScore fuzzy top-k (ref command-score.ts:54-172) -----------
# No SQL equivalent (recursive memoized scorer) → fixture oracle: the
# pure-Python scorer's top-20 over the fixed sf0.01 part table, staged as
# parquet by tools/make_driver_fixtures.py.
def f07_command_score_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_platform_spark.operators.registry import assert_fixture_scale

    assert_fixture_scale(sf_dir, "f07_command_score_topk")
    part = load(spark, sf_dir, "part")
    scored = part.select(
        "p_partkey", "p_name",
        command_score_udf("red gear")("p_name").alias("score"))
    return (scored.orderBy(F.desc("score"), F.asc("p_partkey")).limit(20)
            .select("p_partkey", "p_name"))


# --- F10/F11/F13: string normalization trio -------------------------------
# empty→null coercion (validation.ts:3-17), '*' prefix strip + split
# (texts.airtable.ts:95-102), trailing-slash strip (page.ts router:117-120)
def f10_string_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    starred = F.when(F.col("c_custkey") % 3 == 0,
                     F.concat(F.lit("*"), F.col("c_name"))).otherwise(F.col("c_name"))
    url = F.concat(F.lit("https://example.org/c/"),
                   F.col("c_custkey").cast("string"), F.lit("/"))
    blankable = F.when(F.col("c_custkey") % 7 == 0, F.lit("")).otherwise(
        F.col("c_mktsegment"))
    df = cust.filter(F.col("c_custkey") < 300).select(
        "c_custkey", starred.alias("name_raw"), url.alias("url_raw"),
        blankable.alias("seg_raw"))
    return df.select(
        "c_custkey",
        F.when(F.col("name_raw").startswith("*"),
               F.expr("substring(name_raw, 2)")).otherwise(F.col("name_raw"))
        .alias("name"),
        F.split("name_raw", "#").getItem(0).alias("name_prefix"),
        F.regexp_replace("url_raw", "/$", "").alias("url"),
        F.nullif("seg_raw", F.lit("")).alias("segment"))


F10_SQL = """
WITH built AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0 THEN '*' || c_name ELSE c_name END AS name_raw,
         'https://example.org/c/' || CAST(c_custkey AS VARCHAR) || '/' AS url_raw,
         CASE WHEN c_custkey % 7 = 0 THEN '' ELSE c_mktsegment END AS seg_raw
  FROM customer WHERE c_custkey < 300)
SELECT c_custkey,
       CASE WHEN name_raw LIKE '*%' THEN name_raw[2:] ELSE name_raw END AS name,
       str_split(name_raw, '#')[1] AS name_prefix,
       regexp_replace(url_raw, '/$', '') AS url,
       NULLIF(seg_raw, '') AS segment
FROM built
"""


# --- F11: '*' prefix strip + comma-split (ref texts.airtable.ts:95-102) ---
def f11_star_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    raw = F.when(F.col("c_custkey") % 3 == 0,
                 F.concat(F.lit("*"), F.col("c_name"),
                          F.lit(",alias one,alias two"))).otherwise(
        F.col("c_name"))
    df = cust.filter(F.col("c_custkey") < 300).select(
        "c_custkey", raw.alias("raw"))
    primary = F.when(F.col("raw").startswith("*"),
                     F.expr("substring(raw, 2)")).otherwise(F.col("raw"))
    return df.select(
        "c_custkey",
        F.split(primary, ",").getItem(0).alias("primary_name"),
        F.size(F.split(primary, ",")).alias("n_names"))


F11_SQL = """
WITH built AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0
              THEN '*' || c_name || ',alias one,alias two'
              ELSE c_name END AS raw
  FROM customer WHERE c_custkey < 300),
stripped AS (
  SELECT c_custkey,
         CASE WHEN raw LIKE '*%' THEN raw[2:] ELSE raw END AS primary_raw
  FROM built)
SELECT c_custkey,
       str_split(primary_raw, ',')[1] AS primary_name,
       CAST(len(str_split(primary_raw, ',')) AS INTEGER) AS n_names
FROM stripped
"""


# --- F13: URL trailing-slash normalization (ref page.ts router:117-120) ---
def f13_url_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    raw = F.concat(F.lit("https://example.org/c/"),
                   F.col("c_custkey").cast("string"),
                   F.when(F.col("c_custkey") % 2 == 0, F.lit("/"))
                   .otherwise(F.lit("")))
    return (cust.filter(F.col("c_custkey") < 300)
            .select("c_custkey",
                    F.regexp_replace(raw, "/$", "").alias("url")))


F13_SQL = """
SELECT c_custkey,
       regexp_replace('https://example.org/c/' || CAST(c_custkey AS VARCHAR)
                      || CASE WHEN c_custkey % 2 = 0 THEN '/' ELSE '' END,
                      '/$', '') AS url
FROM customer WHERE c_custkey < 300
"""


# --- F12: lenient JSON parse (ref segment.ts:26-37) -----------------------
def f12_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (ev.filter(F.col("event_id") < 500)
            .select("event_id",
                    F.get_json_object("props", "$.k").cast("long").alias("k")))


F12_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events WHERE event_id < 500
"""


# --- F14: discriminated-union version validation --------------------------
# (ref apps/web/src/server/services/usul/book-versions.ts:30-57 — the zod
# per-provider union, and :59-113 prepareBookVersions' source/value
# normalization). Deterministic version documents are synthesized per
# event_id, round-tripped through REAL JSON (to_json → get_json_object —
# the operator under test is typed validation of a JSON column), then
# validated per the union's rules: discriminator ∈ {external, pdf,
# openiti, turath}; pdf URLs must carry the assets prefix; openiti/turath
# need a non-empty value (z.string().min(1)); valid rows normalize to the
# reference's (source, value) shape. The DuckDB oracle re-derives every
# verdict from the base expressions WITHOUT JSON — an independent path
# that also proves the JSON round-trip lossless.

_PDF_PREFIX = "https://assets.usul.ai/pdfs/"


def f14_version_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    disc = F.when(F.col("event_id") % 13 == 0, F.lit("bulk")).otherwise(
        F.element_at(F.array(F.lit("external"), F.lit("pdf"),
                             F.lit("openiti"), F.lit("turath")),
                     (F.col("event_id") % 4 + 1).cast("int")))
    url = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.lit(_PDF_PREFIX), F.col("event_id"), F.lit(".pdf"))
    ).otherwise(F.concat(F.lit("https://cdn.example.net/"),
                         F.col("event_id"), F.lit(".pdf")))
    value = F.when(F.col("event_id") % 7 == 0, F.lit("")).otherwise(
        F.concat(F.lit("v"), F.col("event_id")))
    doc = F.to_json(F.struct(disc.alias("type"), url.alias("url"),
                             value.alias("value")))

    j = ev.select("event_id", doc.alias("doc"))
    typ = F.get_json_object("doc", "$.type")
    jurl = F.get_json_object("doc", "$.url")
    jval = F.get_json_object("doc", "$.value")
    verdict = (
        F.when(~typ.isin("external", "pdf", "openiti", "turath"),
               F.lit("invalid_discriminator"))
        .when((typ == "pdf") & ~jurl.startswith(_PDF_PREFIX),
              F.lit("invalid_pdf_url"))
        .when(typ.isin("openiti", "turath") & (F.length(jval) < 1),
              F.lit("empty_value"))
        .otherwise(F.lit("ok")))
    # prepareBookVersions: external/pdf carry the url as value;
    # openiti/turath carry the text value; invalid rows normalize to NULL
    norm_value = F.when(verdict != "ok", F.lit(None)).when(
        typ.isin("external", "pdf"), jurl).otherwise(jval)
    return j.select(
        "event_id", typ.alias("source"), verdict.alias("verdict"),
        norm_value.alias("value"),
        (verdict == "ok").cast("int").alias("is_valid"))


F14_SQL = f"""
WITH synth AS (
    SELECT event_id,
           CASE WHEN event_id % 13 = 0 THEN 'bulk'
                ELSE ['external','pdf','openiti','turath'][
                     CAST(event_id % 4 + 1 AS INTEGER)] END AS typ,
           CASE WHEN event_id % 2 = 0
                THEN '{_PDF_PREFIX}' || event_id || '.pdf'
                ELSE 'https://cdn.example.net/' || event_id || '.pdf'
           END AS url,
           CASE WHEN event_id % 7 = 0 THEN '' ELSE 'v' || event_id
           END AS val
    FROM events WHERE event_id < 2000
), judged AS (
    SELECT *,
           CASE WHEN typ NOT IN ('external','pdf','openiti','turath')
                     THEN 'invalid_discriminator'
                WHEN typ = 'pdf' AND url NOT LIKE '{_PDF_PREFIX}%'
                     THEN 'invalid_pdf_url'
                WHEN typ IN ('openiti','turath') AND len(val) < 1
                     THEN 'empty_value'
                ELSE 'ok' END AS verdict
    FROM synth)
SELECT event_id, typ AS source, verdict,
       CASE WHEN verdict <> 'ok' THEN NULL
            WHEN typ IN ('external','pdf') THEN url
            ELSE val END AS value,
       CAST(verdict = 'ok' AS INTEGER) AS is_valid
FROM judged
"""


QUERIES: dict = {
    "f01_word_count": (f01_word_count, F01_SQL),
    "f02_slug": (f02_slug, F02_SQL),
    "f03_hijri": (f03_hijri, F03_SQL),
    "f04_digits": (f04_digits, F04_SQL),
    "f05_translit_norm": (f05_translit_norm, F05_SQL),
    "f06_publishing": (f06_publishing, F06_SQL),
    "f07_command_score_topk": (
        f07_command_score_topk,
        _fixture_sql("command_score_topk.sf0.01.parquet",
                     "p_partkey, p_name")),
    "f10_string_norm": (f10_string_norm, F10_SQL),
    "f11_star_strip": (f11_star_strip, F11_SQL),
    "f12_json_parse": (f12_json_parse, F12_SQL),
    "f13_url_norm": (f13_url_norm, F13_SQL),
    "f14_version_union": (f14_version_union, F14_SQL),
}
