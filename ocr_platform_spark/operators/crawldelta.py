"""Recrawl delta — diff two crawl epochs of the same corpus: which urls
are new, gone, changed, or unchanged, and how big the change is.

A continuously-refreshed web corpus re-crawls every url on a cadence;
the delta table drives everything downstream (re-extract only changed
pages, expire gone ones, route new ones through the full gate chain).
The reference's analogue is the page-redo path (``isRedo`` in
apps/queue/src/queues/page/queue.ts:7-21 — re-OCR one page and overwrite
its row); here the comparison is corpus-wide and set-based.

Plan shape: ONE full-outer join of the two epoch tables on the url key —
kind classification falls out of the join sides (left-null ⇒ new,
right-null ⇒ gone) and an md5 compare, all JVM column math. The edit-
distance probe is TWO-SIDED — ``levenshtein`` over bounded 300-char
prefix AND suffix windows, summed — so end-anchored edits (appended
updates, new lead paragraphs: where web page changes overwhelmingly
live) always register, while cost stays O(window²) per row instead of
the O(len²) full-text distance that belongs offline; it runs only on
changed rows via a ``when`` guard. At 100 TB both epochs live
bucket-partitioned on url-hash in the same layout, so the join is
storage-partitioned and shuffles nothing; the key is unique per epoch,
so there is no skew to salt. DuckDB's ``levenshtein`` matches Spark's
code-point semantics exactly (verified on multilingual text), which is
what lets the probe participate in the value-hashed oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

DELTA_CAP = 2000   # epoch slice: doc_id < DELTA_CAP
LEV_WINDOW = 300   # bounded edit-distance probe width


def _epochs(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two deterministic crawl epochs of the documents slice:
    v1 = the slice as-is; v2 = the re-crawl, where doc_id%11==0 pages
    vanished, %5==0 pages grew an appended update, %7==0 pages got a new
    lead paragraph, %13==0 pages ALSO appear re-keyed as brand-new urls,
    and everything else came back byte-identical."""
    base = docs.filter(F.col("doc_id") < DELTA_CAP).select("doc_id", "text")
    d = F.col("doc_id")
    mutated = (base.filter(d % 11 != 0)
               .select("doc_id",
                       F.when(d % 5 == 0,
                              F.concat(F.col("text"), F.lit("\n\nUpdate "),
                                       d.cast("string")))
                       .when(d % 7 == 0,
                             F.concat(F.lit("BREAKING: "), F.col("text")))
                       .otherwise(F.col("text")).alias("text")))
    fresh = (base.filter(d % 13 == 0)
             .select((d + DELTA_CAP).alias("doc_id"), "text"))
    return base, mutated.unionByName(fresh)


def crawl_delta(v1: DataFrame, v2: DataFrame) -> DataFrame:
    old = v1.select(F.col("doc_id"), F.col("text").alias("old_text"))
    new = v2.select(F.col("doc_id"), F.col("text").alias("new_text"))
    j = old.join(new, "doc_id", "full_outer")
    kind = (F.when(F.col("old_text").isNull(), F.lit("new"))
            .when(F.col("new_text").isNull(), F.lit("gone"))
            .when(F.md5("old_text") == F.md5("new_text"),
                  F.lit("unchanged"))
            .otherwise(F.lit("changed")))
    w = F.lit(LEV_WINDOW)
    probe = F.when(
        kind == "changed",
        F.levenshtein(F.substring("old_text", 1, LEV_WINDOW),
                      F.substring("new_text", 1, LEV_WINDOW))
        + F.levenshtein(F.call_function("right", F.col("old_text"), w),
                        F.call_function("right", F.col("new_text"), w)))
    return j.select(
        "doc_id", kind.alias("kind"),
        F.length("old_text").cast("int").alias("len_old"),
        F.length("new_text").cast("int").alias("len_new"),
        probe.cast("int").alias("lev_probe"))


def cx_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: delta between the two synthesized crawl epochs."""
    return crawl_delta(*_epochs(load(spark, sf_dir, "documents")))


CX_CRAWL_DELTA_SQL = f"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {DELTA_CAP}
), v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || chr(10) || chr(10)
                   || 'Update ' || doc_id
              WHEN doc_id % 7 = 0 THEN 'BREAKING: ' || text
              ELSE text END AS text
  FROM base WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + {DELTA_CAP} AS doc_id, text
  FROM base WHERE doc_id % 13 = 0
), joined AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         o.text AS old_text, n.text AS new_text
  FROM base o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN old_text IS NULL THEN 'new'
            WHEN new_text IS NULL THEN 'gone'
            WHEN md5(old_text) = md5(new_text) THEN 'unchanged'
            ELSE 'changed' END AS kind,
       CAST(len(old_text) AS INTEGER) AS len_old,
       CAST(len(new_text) AS INTEGER) AS len_new,
       CAST(CASE WHEN old_text IS NOT NULL AND new_text IS NOT NULL
                      AND md5(old_text) <> md5(new_text)
                 THEN levenshtein(substr(old_text, 1, {LEV_WINDOW}),
                                  substr(new_text, 1, {LEV_WINDOW}))
                    + levenshtein(right(old_text, {LEV_WINDOW}),
                                  right(new_text, {LEV_WINDOW}))
            END AS INTEGER) AS lev_probe
FROM joined
"""


QUERIES: dict = {
    "cx_crawl_delta": (cx_crawl_delta, CX_CRAWL_DELTA_SQL),
}
