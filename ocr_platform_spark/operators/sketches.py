"""Distinct-count sketches: per-host vocabulary cardinality via KMV.

At 10^12 documents, per-host ``COUNT(DISTINCT token)`` is the classic
scale-killer: the exact answer shuffles every distinct (host, token) pair.
Production engines answer it with bounded-memory sketches (Spark's
``approx_count_distinct`` is HyperLogLog++) — but HLL register layouts are
engine-specific, so an HLL estimate can never participate in a
cross-engine value-hashed oracle. The K-minimum-values sketch (Bar-Yossef
et al. 2002; Beyer et al., SIGMOD 2007) CAN: its state is just the K
smallest values of a shared deterministic hash, and its estimator
``(K-1) * H / h_K`` (H = hash-space size, h_K = the Kth smallest) is exact
integer arithmetic any engine reproduces bit-for-bit.

Hash: the first 14 hex chars of md5(token) read as a 56-bit integer —
md5 is identical everywhere, and 56 bits leaves headroom so
``(K-1) * 2^56`` stays inside int64.

Shape at scale (the whole point):

- phase 1 groups by (source, salt) where salt = h % SALTS is a FUNCTION of
  the hash value: the salt shards partition the distinct-value space, so
  per-shard distinct counts SUM to the exact global distinct (no
  double-counting by construction) — the exact column costs nothing extra;
- each shard keeps only its set size and its K smallest hashes, so the
  phase-2 merge sees at most SALTS * K values per host (bounded state, one
  tiny final aggregate) instead of the full distinct-token stream;
- ``collect_set`` partials combine map-side; the per-task set is bounded
  by the shard's distinct values — the salt count is the knob that trades
  shard-set size against merge width. A production deployment at 10^12
  docs raises SALTS with corpus size or swaps phase 1 for a capped-state
  pandas UDAF; the estimator and the oracle stay identical.

The documents table has no url column, so the sketched universe is the
per-host token vocabulary (the corpus-census statistic ta_host_stats
reports exactly; this is its sketched twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

KMV_K = 16   # small enough that sf0.01's ~30-token host vocabularies
             # exercise the real estimator branch, not just the under-K
             # exact fallback (a production corpus sketch would use 256+)
_SALTS = 8
_HASH_BITS = 56                       # 14 hex chars of md5
_EST_NUM = (KMV_K - 1) * (1 << _HASH_BITS)   # (K-1) * 2^56, fits int64


def _h56(col: str):
    """Shared 56-bit hash: int(md5(x)[:14], 16) — bit-identical in Spark
    (conv) and DuckDB (CAST('0x…' AS BIGINT)); verified in tests."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def kmv_distinct(docs: DataFrame, k: int = KMV_K,
                 salts: int = _SALTS) -> DataFrame:
    """documents(source, text) → (source, n_distinct_exact, kmv_est).

    n_distinct_exact is the true per-host distinct-token count (free from
    the salted decomposition, see module docstring); kmv_est is the KMV
    estimate from the K smallest hashes — equal to the exact count while
    the host's vocabulary is under K.
    """
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    hashed = toks.select("source", _h56("tok").alias("h"))
    shard = (hashed
             .groupBy("source", F.pmod("h", F.lit(salts)).alias("salt"))
             .agg(F.collect_set("h").alias("hs"))
             .select("source",
                     F.size("hs").alias("n_part"),
                     F.slice(F.array_sort("hs"), 1, k).alias("mins")))
    merged = shard.groupBy("source").agg(
        F.sum("n_part").cast("long").alias("n_distinct_exact"),
        F.slice(F.array_sort(F.flatten(F.collect_list("mins"))),
                1, k).alias("mins"))
    hk = F.element_at("mins", k)
    return merged.select(
        "source",
        "n_distinct_exact",
        F.when(F.size("mins") < k, F.size("mins").cast("long"))
        .otherwise(F.expr(f"CAST({_EST_NUM} AS BIGINT)"
                          " DIV greatest(element_at(mins, "
                          f"{k}), CAST(1 AS BIGINT))"))
        .cast("long").alias("kmv_est"))


def ta_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmv_distinct(load(spark, sf_dir, "documents"))


# The oracle computes the same two numbers the direct way — exact distinct
# and the Kth-smallest hash via a per-host rank — so it independently
# validates both the estimator arithmetic AND the salted decomposition's
# exactness claim.
TA_KMV_SQL = rf"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents),
hs AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(tok), 1, 14)) AS BIGINT) AS h
  FROM tok),
ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM hs)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_distinct_exact,
       CAST(CASE WHEN max(n) < {KMV_K} THEN max(n)
                 ELSE {_EST_NUM}
                      // max(CASE WHEN rn = {KMV_K} THEN h END)
            END AS BIGINT) AS kmv_est
FROM ranked
GROUP BY source
"""


QUERIES: dict = {
    "ta_kmv_distinct": (ta_kmv_distinct, TA_KMV_SQL),
}
