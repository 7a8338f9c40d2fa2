"""Ordered event funnel — sequential pattern matching per user.

The event-analytics staple the repo's windowed/session/attribution
queries don't cover: how far does each user get through the ordered
sequence signup → view → click → purchase, where each step must occur
at-or-after the PREVIOUS step's match and within a lag bound? Global
per-type minima are NOT the answer (a click before the first view
must not count); the correct semantics is the greedy first-qualifying
match per step, and the exact-integer form is what ships here.

Two independent formulations, pinned against each other by the
driver's value-hash gate:

- Spark: ONE shuffle — per user ``collect_list(struct(us, stage))``,
  ``array_sort`` (us, then stage, so a simultaneous signup+view
  resolves signup-first deterministically), then a pure-JVM
  ``aggregate`` fold that advances a (reached, s1..s4) state struct
  when the next event's stage is reached+1, its time is >= the last
  match, and the lag bound holds. Sequential pattern matching with
  zero Python and per-user state of five longs — the per-user event
  list is session-sized (the sessionize skew caveat applies to the
  same key; the salted treatment is the same).
- Oracle: chained stepwise minima in DuckDB — s1 = min(signup),
  s2 = min(view >= s1, within lag), s3 = min(click >= s2, …) — four
  tiny per-user aggregates. Greedy-first-match equals chained-min
  BECAUSE each step takes the earliest qualifying event; that
  equivalence is exactly what the gate checks.

Output: one row per user with any signup — reached stage (1-4) and
the step timestamps (NULL past the reached stage). Users who never
signed up have no funnel to report (contract, pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

STAGES = ("signup", "view", "click", "purchase")
FUNNEL_LAG_US = 7 * 24 * 3600 * 1_000_000


def user_funnels(events: DataFrame,
                 lag_us: int = FUNNEL_LAG_US) -> DataFrame:
    stage = F.when(F.col("event_type") == STAGES[0], 1)
    for i, s in enumerate(STAGES[1:], start=2):
        stage = stage.when(F.col("event_type") == s, i)
    evs = (events
           .select("user_id",
                   F.unix_micros(F.col("ts").cast("timestamp"))
                   .alias("us"), stage.alias("stage"))
           .where(F.col("stage").isNotNull()))
    seq = (evs.groupBy("user_id")
           .agg(F.array_sort(F.collect_list(F.struct("us", "stage")))
                .alias("seq")))

    def step(acc, e):
        last = (F.when(acc["reached"] == 1, acc["s1"])
                .when(acc["reached"] == 2, acc["s2"])
                .when(acc["reached"] == 3, acc["s3"])
                .otherwise(F.lit(None).cast("long")))
        advance = (e["stage"] == acc["reached"] + 1) & (
            (acc["reached"] == 0)
            | ((e["us"] >= last) & (e["us"] - last <= F.lit(lag_us))))
        pick = (lambda k, cur: F.when(
            advance & (acc["reached"] + 1 == k), e["us"]).otherwise(cur))
        return F.struct(
            F.when(advance, acc["reached"] + 1)
            .otherwise(acc["reached"]).alias("reached"),
            pick(1, acc["s1"]).alias("s1"),
            pick(2, acc["s2"]).alias("s2"),
            pick(3, acc["s3"]).alias("s3"),
            pick(4, acc["s4"]).alias("s4"))

    zero = F.struct(
        F.lit(0).cast("int").alias("reached"),
        *[F.lit(None).cast("long").alias(f"s{k}") for k in (1, 2, 3, 4)])
    st = F.aggregate("seq", zero, step)
    return (seq.select("user_id", st.alias("st"))
            .where(F.col("st.reached") >= 1)
            .select("user_id",
                    F.col("st.reached").cast("long").alias("reached"),
                    "st.s1", "st.s2", "st.s3", "st.s4"))


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return user_funnels(load(spark, sf_dir, "events"))


EV_FUNNEL_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
u1 AS (
  SELECT user_id, min(us) AS s1 FROM ev
  WHERE event_type = 'signup' GROUP BY 1),
u2 AS (
  SELECT e.user_id, min(us) AS s2 FROM ev e JOIN u1 USING (user_id)
  WHERE event_type = 'view' AND us >= s1
    AND us - s1 <= {FUNNEL_LAG_US} GROUP BY 1),
u3 AS (
  SELECT e.user_id, min(us) AS s3 FROM ev e JOIN u2 USING (user_id)
  WHERE event_type = 'click' AND us >= s2
    AND us - s2 <= {FUNNEL_LAG_US} GROUP BY 1),
u4 AS (
  SELECT e.user_id, min(us) AS s4 FROM ev e JOIN u3 USING (user_id)
  WHERE event_type = 'purchase' AND us >= s3
    AND us - s3 <= {FUNNEL_LAG_US} GROUP BY 1)
SELECT u1.user_id,
       CAST(CASE WHEN s4 IS NOT NULL THEN 4
                 WHEN s3 IS NOT NULL THEN 3
                 WHEN s2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)
           AS reached,
       s1, s2, s3, s4
FROM u1 LEFT JOIN u2 USING (user_id) LEFT JOIN u3 USING (user_id)
LEFT JOIN u4 USING (user_id)
"""

QUERIES: dict = {
    # wave 62: ordered event funnel, beyond-window
    "ev_funnel": (ev_funnel, EV_FUNNEL_SQL),
}
