"""As-of (point-in-time) join — the event-stream enrichment operator Spark
lacks as a built-in: every probe row is matched to the LATEST snapshot row
of the same key with snapshot time <= probe time (inclusive), or to NULL
when none precedes it.

Reference analogue: the "state of the book when this page was reviewed"
lookups the reference answers with per-row Prisma queries against the
status-transition audit rows (packages/db/prisma/schema.prisma:20-39
``Book.status``/``reviewedAt``); here it is one distributed plan, and the
operator generalizes to the training-data uses (price/config/model-version
as of the example's timestamp).

Physical shape — the union trick, NOT a join: snapshots and probes are
unioned with a tag, shuffled ONCE on the key, sorted per key by
(time, tag), and the snapshot value is carried forward with
``last(..., ignorenulls=True)`` over a running row frame. Cost is one
exchange + sort of |probe| + |snap| rows — never the |probe| x |snap|
blow-up of the naive range join, and no per-key collect. Snapshot-time
ties within a key resolve to the max snapshot id by sort order alone (no
pre-aggregation shuffle), and a snapshot sorts BEFORE probes at the same
instant (tag 0 < 1), making the match inclusive — both pinned by tests
and by the
DuckDB ``ASOF LEFT JOIN`` oracle, which is an independent engine-native
implementation of the same semantics. Key skew rides the same mitigation
as sessionize_partitioned (streaming/sessions.py): a hot key can be
range-split by time buckets with boundary carry-in; at the testdata's
key cardinality the plain per-key sort is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

SNAP_MOD = 29      # events with event_id % SNAP_MOD == 0 are snapshots
PROBE_CAP = 5000   # probe slice: event_id < PROBE_CAP


def asof_join(probe: DataFrame, snap: DataFrame) -> DataFrame:
    """probe(event_id, user_id, us) x snap(user_id, us, snap_id) →
    one row per probe with the latest snap at-or-before its time.

    Snapshot ties at one (key, instant) need NO pre-aggregation (that
    would be a second shuffle on a different key): the window orders
    tied snapshots by snap_id, so the running ``last`` carries the max
    snap_id past the tie — dedup falls out of the sort order for free."""
    s = snap.select("user_id", "us", F.lit(0).alias("tag"), "snap_id",
                    F.lit(None).cast("long").alias("event_id"))
    p = probe.select("user_id", "us", F.lit(1).alias("tag"),
                     F.lit(None).cast("long").alias("snap_id"), "event_id")
    w = (Window.partitionBy("user_id")
         .orderBy("us", "tag", "snap_id", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (s.unionByName(p)
               .withColumn("asof_snap",
                           F.last("snap_id", ignorenulls=True).over(w))
               .withColumn("asof_us",
                           F.last(F.when(F.col("tag") == 0, F.col("us")),
                                  ignorenulls=True).over(w)))
    return (carried.filter(F.col("tag") == 1)
            .select("event_id", "user_id",
                    F.col("us").alias("event_us"),
                    F.col("asof_snap").alias("snap_id"),
                    (F.col("us") - F.col("asof_us")).alias("snap_age_us")))


def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: enrich each event with the user's latest prior
    snapshot (a deterministic slice of the same events table — snapshots
    are the event_id % SNAP_MOD == 0 rows, so a snapshot event matches
    itself at age 0, pinning the inclusive bound)."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    snap = (ev.filter(F.col("event_id") % SNAP_MOD == 0)
            .select("user_id", us.alias("us"),
                    F.col("event_id").alias("snap_id")))
    probe = (ev.filter(F.col("event_id") < PROBE_CAP)
             .select("event_id", "user_id", us.alias("us")))
    return asof_join(probe, snap)


EV_ASOF_SQL = f"""
WITH snap AS (
  SELECT user_id, ts, MAX(event_id) AS snap_id
  FROM events WHERE event_id % {SNAP_MOD} = 0
  GROUP BY user_id, ts
), probe AS (
  SELECT event_id, user_id, ts FROM events WHERE event_id < {PROBE_CAP}
)
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS event_us, s.snap_id,
       epoch_us(p.ts) - epoch_us(s.ts) AS snap_age_us
FROM probe p ASOF LEFT JOIN snap s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


QUERIES: dict = {
    "ev_asof_join": (ev_asof_join, EV_ASOF_SQL),
}
