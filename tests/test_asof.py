"""As-of join (operators/asof.py): inclusive bound, no-prior-snapshot
NULLs, same-instant snapshot dedup, oracle parity at sf0.001 against
DuckDB's native ASOF LEFT JOIN, and the single-exchange plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.operators import asof
from tools.check_oracles import row_multiset

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_inclusive_bound_and_carry_forward(spark):
    """A probe AT the snapshot instant matches it (age 0); later probes
    carry it until the next snapshot; earlier probes get NULL."""
    snap = _mk(spark, [(1, 100, 10), (1, 200, 20)],
               ["user_id", "us", "snap_id"])
    probe = _mk(spark, [(901, 1, 50), (902, 1, 100), (903, 1, 150),
                        (904, 1, 200), (905, 1, 250)],
                ["event_id", "user_id", "us"])
    out = {r["event_id"]: r for r in asof.asof_join(probe, snap).collect()}
    assert out[901]["snap_id"] is None and out[901]["snap_age_us"] is None
    assert out[902]["snap_id"] == 10 and out[902]["snap_age_us"] == 0
    assert out[903]["snap_id"] == 10 and out[903]["snap_age_us"] == 50
    assert out[904]["snap_id"] == 20 and out[904]["snap_age_us"] == 0
    assert out[905]["snap_id"] == 20 and out[905]["snap_age_us"] == 50


def test_same_instant_snapshots_collapse_to_max_id(spark):
    snap = _mk(spark, [(1, 100, 10), (1, 100, 30), (1, 100, 20)],
               ["user_id", "us", "snap_id"])
    probe = _mk(spark, [(901, 1, 100)], ["event_id", "user_id", "us"])
    [row] = asof.asof_join(probe, snap).collect()
    assert row["snap_id"] == 30


def test_keys_do_not_cross(spark):
    snap = _mk(spark, [(1, 100, 10)], ["user_id", "us", "snap_id"])
    probe = _mk(spark, [(901, 2, 500)], ["event_id", "user_id", "us"])
    [row] = asof.asof_join(probe, snap).collect()
    assert row["snap_id"] is None


def test_oracle_parity_sf0001(spark):
    df = asof.ev_asof_join(spark, SF_DIR)
    got = row_multiset([tuple(r) for r in df.collect()], df.columns)
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/events.parquet')")
    rel = con.sql(asof.EV_ASOF_SQL)
    want = row_multiset(rel.fetchall(), [d[0] for d in rel.description])
    assert got == want


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_partitioned_matches_plain_on_events_table(spark):
    got = asof.ev_asof_skew(spark, SF_DIR)
    assert _rows(got) == _rows(asof.ev_asof_join(spark, SF_DIR))


def test_partitioned_carry_crosses_empty_buckets(spark):
    """A probe whose bucket has no snapshot — and whose PREVIOUS bucket
    has none either — must still receive the last snapshot from further
    back (the compressed carry walks the active bucket universe with
    ignorenulls, not just the adjacent bucket)."""
    w = 100  # tiny bucket width so the layout is explicit
    snap = _mk(spark, [(1, 10, 7), (1, 15, 8)], ["user_id", "us", "snap_id"])
    probe = _mk(spark, [(901, 1, 350),   # bucket 3: empty, b1/b2 empty too
                        (902, 1, 12),    # bucket 0: in-bucket snap at 10
                        (903, 1, 5)],    # bucket 0: before any snapshot
                ["event_id", "user_id", "us"])
    out = {r["event_id"]: r
           for r in asof.asof_join_partitioned(probe, snap,
                                               bucket_us=w).collect()}
    assert out[901]["snap_id"] == 8 and out[901]["snap_age_us"] == 335
    assert out[902]["snap_id"] == 7 and out[902]["snap_age_us"] == 2
    assert out[903]["snap_id"] is None


def test_partitioned_randomized_parity_across_widths(spark):
    import random

    rng = random.Random(20260819)
    snap_rows, probe_rows = [], []
    eid = 0
    for user in range(1, 7):
        t = rng.randrange(0, 500)
        for _ in range(40):
            snap_rows.append((user, t, eid)); eid += 1
            t += rng.choice([1, 50, 99, 100, 101, 1000])
        t = rng.randrange(0, 500)
        for _ in range(150):
            probe_rows.append((eid, user, t)); eid += 1
            t += rng.choice([1, 37, 100, 400])
    # instant ties: duplicate snapshots and probes at shared instants
    snap_rows += [(1, 777, 9001), (1, 777, 9002)]
    probe_rows += [(9100, 1, 777), (9101, 1, 777)]
    snap = _mk(spark, snap_rows, ["user_id", "us", "snap_id"])
    probe = _mk(spark, probe_rows, ["event_id", "user_id", "us"])
    expect = _rows(asof.asof_join(probe, snap))
    for w in (100, 1000, 10**9):
        got = _rows(asof.asof_join_partitioned(probe, snap, bucket_us=w))
        assert got == expect, f"bucket_us={w}"


def test_partitioned_hot_key_is_bounded(spark):
    """A bot key with 100x the probes: the partitioned variant's
    event-scale key (user_id, bucket) caps the largest group by the
    bot's per-bucket density while the answers stay identical."""
    probe_rows = [(i, 1, 25 * i) for i in range(2000)]       # the bot
    probe_rows += [(10000 + 20 * u + k, u, 2500 * k)
                   for u in range(2, 52) for k in range(20)]
    snap_rows = [(u, 1000 * s, 500000 + u * 100 + s)
                 for u in range(1, 52) for s in range(5)]
    probe = _mk(spark, probe_rows, ["event_id", "user_id", "us"])
    snap = _mk(spark, snap_rows, ["user_id", "us", "snap_id"])

    w = 1800  # vs the bot's 50,000-us spread → ~28 buckets
    per_key = (probe.groupBy("user_id").count()
               .agg(F.max("count")).first()[0])
    per_split = (probe.groupBy(
        "user_id", F.call_function(
            "div", F.col("us"), F.lit(w).cast("long")).alias("b"))
        .count().agg(F.max("count")).first()[0])
    assert per_key == 2000
    assert per_split * 10 <= per_key, (per_split, per_key)
    assert _rows(asof.asof_join_partitioned(probe, snap, bucket_us=w)) \
        == _rows(asof.asof_join(probe, snap))


def test_partitioned_plan_event_scale_key_is_composite(spark):
    """Plan pin: the event-scale window shuffles on (user_id, bucket);
    raw-user_id partitioning exists only for the compressed bucket-carry
    window (one row per active (key, bucket))."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof.ev_asof_skew(spark, SF_DIR).explain("formatted")
    p = buf.getvalue()
    assert any("bucket" in line and "hashpartitioning(user_id" in line
               for line in p.splitlines()), p


def test_plan_one_exchange_no_join(spark):
    """The union trick must cost exactly one hash exchange (the per-key
    window sort) — no join node, no second shuffle, probe and snapshot
    scans union below the exchange."""
    df = asof.ev_asof_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
