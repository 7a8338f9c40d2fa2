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


def test_plan_one_exchange_no_join(spark):
    """The union trick must cost exactly one hash exchange (the per-key
    window sort) — no join node, no second shuffle, probe and snapshot
    scans union below the exchange."""
    df = asof.ev_asof_join(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
