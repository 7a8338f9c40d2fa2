"""Ordered event funnel (operators/funnel.py)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from ocr_platform_spark.operators.funnel import (FUNNEL_LAG_US, STAGES,
                                                 ev_funnel, user_funnels)
from ocr_platform_spark.streaming.windowed import EVENTS_SCHEMA

T0 = dt.datetime(2024, 3, 1)
SF_DIR = "/root/testdata/sf0.01"


def _events(spark, spec):
    """spec: (user_id, minutes, event_type)."""
    pdf = pd.DataFrame({
        "event_id": list(range(len(spec))),
        "ts": [T0 + dt.timedelta(minutes=m) for _, m, _ in spec],
        "user_id": [u for u, _, _ in spec],
        "event_type": [t for _, _, t in spec],
        "value": [1.0] * len(spec),
        "props": ["{}"] * len(spec),
    })
    return spark.createDataFrame(pdf, schema=EVENTS_SCHEMA)


def _us(minutes):
    return int((T0 + dt.timedelta(minutes=minutes)).timestamp() * 1e6)


def test_order_matters_not_global_minima(spark):
    # user 1: view BEFORE signup must not count; the later view does
    ev = _events(spark, [
        (1, 0, "view"), (1, 10, "signup"), (1, 20, "view"),
        (1, 30, "click"), (1, 40, "purchase"),
        # user 2: full set present but purchase precedes click: stops at 3
        (2, 0, "signup"), (2, 5, "view"), (2, 8, "purchase"),
        (2, 9, "click"),
        # user 3: no signup at all → no row
        (3, 0, "view"), (3, 1, "click"),
    ])
    rows = {r["user_id"]: r for r in user_funnels(ev).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["reached"] == 4
    assert rows[1]["s2"] == _us(20)           # not the minute-0 view
    assert rows[2]["reached"] == 3 and rows[2]["s4"] is None


def test_lag_bound_and_simultaneous_events(spark):
    lag_min = FUNNEL_LAG_US // 60_000_000
    ev = _events(spark, [
        # view arrives past the lag window: funnel stalls at signup
        (1, 0, "signup"), (1, lag_min + 1, "view"),
        # simultaneous signup+view at the same instant: both count
        (2, 0, "signup"), (2, 0, "view"), (2, 1, "click"),
    ])
    rows = {r["user_id"]: r for r in user_funnels(ev).collect()}
    assert rows[1]["reached"] == 1 and rows[1]["s2"] is None
    assert rows[2]["reached"] == 3
    assert rows[2]["s1"] == rows[2]["s2"] == _us(0)


def test_matches_pure_python_replay_on_events_table(spark):
    from ocr_platform_spark.operators.tables import load

    evs = (load(spark, SF_DIR, "events")
           .select("user_id", "ts", "event_type").collect())
    stage_of = {s: i + 1 for i, s in enumerate(STAGES)}
    per_user: dict = {}
    for r in evs:
        if r["event_type"] in stage_of:
            us = int(r["ts"].replace(
                tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            per_user.setdefault(r["user_id"], []).append(
                (us, stage_of[r["event_type"]]))
    want = {}
    for u, seq in per_user.items():
        reached, ts = 0, [None] * 5
        for us, st in sorted(seq):
            if st == reached + 1 and (
                    reached == 0 or (us >= ts[reached]
                                     and us - ts[reached] <= FUNNEL_LAG_US)):
                reached += 1
                ts[reached] = us
        if reached >= 1:
            want[u] = (reached, ts[1], ts[2], ts[3], ts[4])
    got = {r["user_id"]: (r["reached"], r["s1"], r["s2"], r["s3"], r["s4"])
           for r in ev_funnel(spark, SF_DIR).collect()}
    assert got == want and len(got) >= 100
