"""Streaming corpus top-up: new crawl files → curated corpus, continuously.

`plans/corpus_job.py` is the one-shot batch build of a training corpus;
this module is its standing daily-top-up form, the job that keeps a
100 TB corpus current as crawl drops land:

    readStream over the pages directory
      → the identical extraction kernel   (streaming/ingest.extract_stream)
      → foreachBatch:
          URL gate → failure routing → langid gate → Gopher gate
          → in-batch exact dedup (fingerprint keep-first)
          → CROSS-RUN near-dup against the persisted MinHash signature
            store (operators/incremental.incremental_ingest — prior text
            is never re-read; only signatures and the pruned band-bucket
            partitions are)
          → epoch-partitioned append to the corpus + a counters manifest

Why foreachBatch: the signature store is read-and-appended per batch —
a stateful side effect Structured Streaming's built-in sinks can't
express. The file-source checkpoint still guarantees each input file is
processed exactly once across restarts; within a batch, idempotency is
by construction:

- corpus rows land under ``ingest_epoch=<epoch_id>/`` with dynamic
  partition overwrite, so a replayed epoch REPLACES its own rows instead
  of duplicating them;
- the signature store is written the same way (epoch-partitioned
  dynamic overwrite) and the dedup check EXCLUDES the current epoch's
  store rows plus self-pairs, so a replayed micro-batch reaches the
  identical keep/drop decision it would have reached the first time —
  never matching against its own failed attempt
  (operators/incremental.incremental_ingest with ``epoch=``).

Same-url re-crawls in later drops are deliberately NOT dropped by the
near-dup store (a document is never a duplicate of itself — the
self-pair rule); url-level keep-newest is a separate policy stage
(dd_url_dedup) a consumer applies when reading the corpus.

Gates reuse the batch pipeline's shared expressions (`gopher_checks`,
`detect_language_udf`, same fingerprint), so a doc is kept by the stream
iff the batch pipeline would keep it given the same arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_platform_spark.operators.incremental import incremental_ingest
from ocr_platform_spark.operators.text_analysis import (
    gopher_checks, gopher_pass)
from ocr_platform_spark.plans.corpus_job import (
    BLOCKED_HOSTS, TARGET_LANGS, URL_BLOCK_RE)
from ocr_platform_spark.streaming.ingest import extract_stream

CORPUS_COLS = ("url", "host", "lang", "lang_det", "n_tok", "fp")


def curate_extracted(extracted: DataFrame) -> DataFrame:
    """The batch gates over an already-extracted relation: URL gate,
    failure routing, langid, Gopher, in-batch exact dedup. Everything is
    map-side column math plus one bounded per-fingerprint window."""
    from ocr_platform_spark.operators.text_analysis import (
        detect_language_udf)

    checks, n_tok, _ = gopher_checks(F.col("text"))
    derived = (extracted
               .select("url", "lang",
                       F.col("extracted_text").alias("text"),
                       "failed_stage")
               .withColumn("host",
                           F.regexp_extract(F.col("url"),
                                            "^https://([^/]+)", 1))
               .filter(~F.col("host").isin(*BLOCKED_HOSTS))
               .filter(~F.col("url").rlike(URL_BLOCK_RE))
               .filter(F.col("failed_stage").isNull())
               .withColumn("lang_det", detect_language_udf(F.col("text")))
               .filter(F.col("lang_det").isin(*TARGET_LANGS))
               .withColumn("quality_pass", gopher_pass(checks))
               .filter(F.col("quality_pass"))
               .withColumn("n_tok", n_tok.cast("long"))
               .withColumn("fp", F.md5(F.encode(
                   F.lower(F.regexp_replace(F.trim(F.col("text")),
                                            r"\s+", " ")), "UTF-8"))))
    w = Window.partitionBy("fp").orderBy("url")
    return (derived.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))


def _process_batch(batch: DataFrame, epoch_id: int, corpus_dir: str,
                   store_dir: str) -> None:
    from ocr_platform_spark.operators.incremental import _dynamic_overwrite

    spark = batch.sparkSession
    batch = batch.persist()
    gated = curate_extracted(batch).persist()
    survivors = incremental_ingest(
        spark,
        gated.select(F.col("url").alias("doc_id"), "text",
                     "host", "lang", "lang_det", "n_tok", "fp"),
        store_dir, epoch=str(int(epoch_id)))
    out = (survivors
           .select(F.col("doc_id").alias("url"), "host", "lang",
                   "lang_det", "n_tok", "fp")
           .withColumn("ingest_epoch", F.lit(int(epoch_id)))
           .persist())
    _dynamic_overwrite(out, corpus_dir + "/docs", "ingest_epoch")
    counters = spark.createDataFrame(
        [(int(epoch_id), int(batch.count()), int(gated.count()),
          int(out.count()))],
        "ingest_epoch long, extracted long, gated long, ingested long")
    _dynamic_overwrite(counters, corpus_dir + "/manifest", "ingest_epoch")
    out.unpersist()
    gated.unpersist()
    batch.unpersist()


def run_corpus_stream(spark: SparkSession, input_dir: str, corpus_dir: str,
                      store_dir: str, checkpoint_dir: str,
                      n_buckets: int = 64):
    """Drain every unprocessed pages file through extract → curate →
    incremental dedup into the corpus (AvailableNow; call again whenever
    new crawl files land — the checkpoint's file log resumes exactly
    where the last run stopped)."""
    ext = extract_stream(spark, input_dir, n_buckets)
    return (ext.writeStream
            .foreachBatch(lambda df, eid: _process_batch(
                df, eid, corpus_dir, store_dir))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.parquet(corpus_dir + "/docs")


def read_manifest(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.parquet(corpus_dir + "/manifest")
