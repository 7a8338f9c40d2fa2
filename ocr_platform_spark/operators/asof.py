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
implementation of the same semantics. Key skew gets the same treatment
as sessionize_partitioned (streaming/sessions.py): ``asof_join_
partitioned`` range-splits hot keys by time bucket with a compressed
per-bucket carry-in, so the event-scale sort never shuffles on the raw
key; at the testdata's key cardinality the plain per-key sort is the
right default plan.
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


# Width of the phase-1 time buckets in asof_join_partitioned. Correctness
# does not depend on the width (proof in the docstring); it only tunes how
# many tasks a hot key spreads across — the same knob, and the same 6 h
# default, as sessionize_partitioned (streaming/sessions.py).
ASOF_BUCKET_US = 6 * 3600 * 1_000_000


def asof_join_partitioned(probe: DataFrame, snap: DataFrame,
                          bucket_us: int = ASOF_BUCKET_US) -> DataFrame:
    """Skew-proof as-of join: identical output to ``asof_join``, but the
    event-scale sort shuffles on (key, time-bucket) instead of raw key —
    a bot key with 100x the rows spreads over its time buckets instead of
    serializing one straggler task (the sessionize_partitioned treatment
    applied to as-of).

    Decomposition: for a probe at time t in bucket b, the latest snapshot
    at-or-before t is either (a) the latest snapshot <= t INSIDE bucket b
    — found by the same union-trick window, now partitioned (key, b) — or,
    if none exists, (b) the latest snapshot of the nearest earlier bucket
    with any snapshot, which is independent of t (every snapshot in a
    bucket < b precedes every probe instant of bucket b, because the
    bucketing is monotone in time). (b) is computed on a COMPRESSED
    table: one row per active (key, bucket) — max-(us, snap_id) struct
    per snapshot bucket, null rows for probe-only buckets so the carry
    crosses empty buckets — with ``last(..., ignorenulls)`` over the
    per-key bucket sequence. That per-key window sees buckets, not rows,
    so the hot key's raw volume never concentrates anywhere."""
    b_snap = F.call_function(
        "div", F.col("us"), F.lit(int(bucket_us)).cast("long"))
    s = snap.withColumn("bucket", b_snap)
    p = probe.withColumn("bucket", b_snap)

    # per-(key, bucket) best snapshot — struct order (us, snap_id) makes
    # instant-ties resolve to max snap_id, same rule as asof_join
    bucket_best = (s.groupBy("user_id", "bucket")
                   .agg(F.max(F.struct("us", "snap_id")).alias("best")))
    # active bucket universe from BOTH sides, so probe-only buckets still
    # receive the carry from older snapshot buckets
    universe = (p.select("user_id", "bucket").distinct()
                .unionByName(bucket_best.select("user_id", "bucket"))
                .distinct()
                .join(bucket_best, ["user_id", "bucket"], "left"))
    wu = (Window.partitionBy("user_id").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = universe.select(
        "user_id", "bucket",
        F.last("best", ignorenulls=True).over(wu).alias("carry"))

    # local (key, bucket) union-trick pass, then fall back to the carry
    su = s.select("user_id", "bucket", "us", F.lit(0).alias("tag"),
                  "snap_id", F.lit(None).cast("long").alias("event_id"))
    pu = p.select("user_id", "bucket", "us", F.lit(1).alias("tag"),
                  F.lit(None).cast("long").alias("snap_id"), "event_id")
    wb = (Window.partitionBy("user_id", "bucket")
          .orderBy("us", "tag", "snap_id", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = (su.unionByName(pu)
             .withColumn("l_snap",
                         F.last("snap_id", ignorenulls=True).over(wb))
             .withColumn("l_us",
                         F.last(F.when(F.col("tag") == 0, F.col("us")),
                                ignorenulls=True).over(wb))
             .filter(F.col("tag") == 1))
    joined = local.join(carry, ["user_id", "bucket"], "left")
    asof_snap = F.coalesce("l_snap", F.col("carry")["snap_id"])
    asof_us = F.coalesce("l_us", F.col("carry")["us"])
    return joined.select(
        "event_id", "user_id", F.col("us").alias("event_us"),
        asof_snap.alias("snap_id"),
        (F.col("us") - asof_us).alias("snap_age_us"))


def _events_probe_snap(spark: SparkSession,
                       sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    snap = (ev.filter(F.col("event_id") % SNAP_MOD == 0)
            .select("user_id", us.alias("us"),
                    F.col("event_id").alias("snap_id")))
    probe = (ev.filter(F.col("event_id") < PROBE_CAP)
             .select("event_id", "user_id", us.alias("us")))
    return probe, snap


def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: enrich each event with the user's latest prior
    snapshot (a deterministic slice of the same events table — snapshots
    are the event_id % SNAP_MOD == 0 rows, so a snapshot event matches
    itself at age 0, pinning the inclusive bound)."""
    return asof_join(*_events_probe_snap(spark, sf_dir))


def ev_asof_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query for the skew-proof variant — same oracle as
    ev_asof_join (identical semantics; only the plan differs)."""
    return asof_join_partitioned(*_events_probe_snap(spark, sf_dir))


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
    # same semantics, skew-proof plan — the oracle is shared on purpose
    "ev_asof_skew": (ev_asof_skew, EV_ASOF_SQL),
}
