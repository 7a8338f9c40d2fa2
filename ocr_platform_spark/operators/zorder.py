"""Z-order (Morton) layout keys — multi-dimensional file skipping.

A 100 TB table is pruned, not scanned: columnar layouts skip a file
when its min/max stats exclude the predicate. A LINEAR sort gives that
power to ONE dimension only — sort the crawl by capture day and every
file spans all hosts, so a host-filtered query still reads everything.
The lakehouse answer (Delta/Iceberg ``OPTIMIZE ZORDER BY``) is to sort
by a MORTON KEY: interleave the bits of both dimensions so rows close
in EITHER dimension land close in the file order, and min/max stats
prune on both. This module is that operator, engine-portable:

- ``zorder_key(a, b)``: the 32-bit Morton interleave of the low 16
  bits of each dimension — a closed-form integer projection (32 shift/
  mask terms, all inside whole-stage codegen; no UDF). Dimensions
  wider than 16 bits must be range-rank-compressed or hashed first —
  documented contract, asserted by the masking.
- ``cx_zorder_key``: driver query over ``events`` — (user_id, day
  since epoch-of-corpus) interleaved. The oracle is the SAME 32-term
  arithmetic generated for DuckDB by ``_zexpr_sql`` — one generator
  emits both engines' expressions, so the bit layout cannot drift.
- ``zorder_layout`` / ``linear_layout``: write the table range-
  partitioned + sorted by zkey (resp. by day) — the two layouts the
  file-skipping test measures against each other with REAL parquet
  row-group stats (tests/test_zorder.py): under z-order BOTH a
  user-slice and a day-slice skip most files; under the linear sort
  the user-slice can skip nothing.

Scale shape: the key is a projection; the layout write is one range
exchange (the sort a lakehouse compaction job already pays). Skew in
either dimension degrades locality gracefully — the key is still
total-ordered, so pruning never turns WRONG, only less effective.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

Z_BITS = 16
CORPUS_EPOCH = "2024-01-01"


def zorder_key(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave: bit k of ``a`` → key bit 2k, bit k of ``b`` →
    key bit 2k+1. Pure JVM shift/mask arithmetic."""
    z = F.lit(0).cast("long")
    for k in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(a.cast("long"), k)
                           .bitwiseAND(F.lit(1)), 2 * k)
             + F.shiftleft(F.shiftright(b.cast("long"), k)
                           .bitwiseAND(F.lit(1)), 2 * k + 1))
    return z


def _zexpr_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """The identical interleave for DuckDB — generated from the same
    loop so Spark and the oracle share one bit layout by construction."""
    terms = []
    for k in range(bits):
        terms.append(f"((({a} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({b} >> {k}) & 1) << {2 * k + 1})")
    return " + ".join(terms)


def _evented(events: DataFrame) -> DataFrame:
    day = F.datediff(F.to_date(F.col("ts")), F.lit(CORPUS_EPOCH))
    return events.select(
        "event_id", "user_id", day.cast("long").alias("day"))


def _norm16(col: Column, lo: int, hi: int) -> Column:
    """Range-normalize to the full 16-bit domain with exact integer
    math. Raw interleave is NOT enough: a dimension with fewer
    significant bits (day: 5 bits vs user: 8 here) would surrender the
    key's top bits to the wider one and prune poorly — the first draft
    of the layout test measured exactly that (2/8 day files skippable;
    normalized: 5/8+). Delta's OPTIMIZE normalizes by range partition
    ids for the same reason."""
    if hi <= lo:
        return F.lit(0).cast("long")
    return F.call_function(
        "div", (col - F.lit(lo)) * F.lit(65535), F.lit(hi - lo))


def with_zkey(events: DataFrame) -> DataFrame:
    """zkey over range-normalized dims. The min/max stats are 4 longs
    collected to the driver (model-state pattern, like the IVF
    centroids) and folded back as literals — one tiny agg job, then
    one projection."""
    ev = _evented(events)
    s = ev.agg(F.min("user_id"), F.max("user_id"),
               F.min("day"), F.max("day")).collect()[0]
    return ev.withColumn(
        "zkey", zorder_key(_norm16(F.col("user_id"), s[0], s[1]),
                           _norm16(F.col("day"), s[2], s[3])))


def cx_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_zkey(load(spark, sf_dir, "events"))


def zorder_layout(events: DataFrame, path: str,
                  bucket_bits: int = 3) -> None:
    """The OPTIMIZE ZORDER BY shape: files cut on FIXED key ranges (the
    top ``bucket_bits`` of the 32-bit Morton key = the 2^bucket_bits
    coarsest curve segments), one exchange, one file per segment.
    Fixed-width cuts instead of repartitionByRange: the range
    partitioner SAMPLES to place boundaries, which wobbles file stats
    run to run — the layout test's skip counts are exact grid
    arithmetic only under deterministic cuts."""
    z = with_zkey(events).withColumn(
        "zbucket", F.shiftright(F.col("zkey"), 2 * Z_BITS - bucket_bits))
    (z.repartition(1 << bucket_bits, "zbucket")
     .sortWithinPartitions("zkey")
     .write.mode("overwrite").partitionBy("zbucket").parquet(path))


def linear_layout(events: DataFrame, path: str,
                  n_files: int = 8) -> None:
    """The baseline a naive pipeline ships: time-bucketed files (fixed
    equal-width day ranges, same determinism rationale)."""
    z = with_zkey(events)
    s = z.agg(F.min("day"), F.max("day")).collect()[0]
    bucket = F.call_function(
        "div", (F.col("day") - F.lit(s[0])) * F.lit(n_files),
        F.lit(s[1] - s[0] + 1))
    (z.withColumn("zbucket", bucket)
     .repartition(n_files, "zbucket")
     .sortWithinPartitions("day")
     .write.mode("overwrite").partitionBy("zbucket").parquet(path))


CX_ZORDER_SQL = f"""
WITH d AS (
  SELECT event_id, user_id,
         date_diff('day', DATE '{CORPUS_EPOCH}', ts::DATE) AS day
  FROM events),
s AS (
  SELECT min(user_id) AS lu, max(user_id) AS hu,
         min(day) AS ld, max(day) AS hd
  FROM d),
n AS (
  SELECT event_id, user_id, day,
         CASE WHEN hu > lu
              THEN ((user_id - lu) * 65535) // (hu - lu) ELSE 0 END AS u16,
         CASE WHEN hd > ld
              THEN ((day - ld) * 65535) // (hd - ld) ELSE 0 END AS d16
  FROM d, s)
SELECT event_id, user_id, day,
       CAST({_zexpr_sql("u16", "d16")} AS BIGINT) AS zkey
FROM n
"""

QUERIES: dict = {
    # wave 56: Morton layout key, beyond-window (live-SQL oracle)
    "cx_zorder_key": (cx_zorder_key, CX_ZORDER_SQL),
}
