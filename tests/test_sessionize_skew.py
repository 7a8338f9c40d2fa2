"""sessionize_partitioned — the skew-proof twin of sessionize.

Proves the three claims the VERDICT asked for:

1. Output identity with the plain variant — on the real events table AND
   on adversarial boundary-straddling inputs (sessions spanning multiple
   buckets, gaps exactly at/over GAP_US, bucket width below the gap).
2. A 100x-skewed hot user's event scan is BOUNDED: the phase-1 shuffle
   key is (user_id, bucket), so the largest per-task event group shrinks
   by the user's time spread instead of being the whole user.
3. The phase-2 merge input is runs, not events (dense bots collapse to
   ~1 run per bucket), pinned on the physical plan.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from ocr_platform_spark.streaming.sessions import (
    GAP_US, SESSION_BUCKET_US, sessionize, sessionize_partitioned)
from ocr_platform_spark.streaming.windowed import EVENTS_SCHEMA

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def spark():
    from ocr_platform_spark.session import build_spark
    return build_spark("sessionize-skew-tests", cores=4,
                       shuffle_partitions=8)


def _df(spark, spec):
    """spec: (event_id, seconds_after_t0, user_id, value) rows."""
    pdf = pd.DataFrame({
        "event_id": [e for e, _, _, _ in spec],
        "ts": [T0 + dt.timedelta(seconds=s) for _, s, _, _ in spec],
        "user_id": [u for _, _, u, _ in spec],
        "event_type": ["click"] * len(spec),
        "value": [v for _, _, _, v in spec],
        "props": ["{}"] * len(spec),
    })
    return spark.createDataFrame(pdf, schema=EVENTS_SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_plain_on_events_table(spark):
    from ocr_platform_spark.operators.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    assert _rows(sessionize_partitioned(ev)) == _rows(sessionize(ev))


def test_boundary_sessions_merge_exactly(spark):
    """Sessions that straddle bucket edges must merge back; gaps exactly
    GAP_US stay one session, GAP_US + 1us splits — with bucket width BELOW
    the gap (correctness may not depend on the width)."""
    gap_s = GAP_US // 1_000_000
    bucket_us = 1800 * 1_000_000          # 30 min buckets < 6 h default
    spec = [
        # user 1: one session of 7 events spaced 20 min apart — crosses
        # five 30-min bucket edges, must come back as ONE session
        *[(i, 1200 * i, 1, 1.0) for i in range(7)],
        # user 2: two events separated by exactly the gap (same session),
        # then a third 1 second past the gap (new session)
        (10, 0, 2, 2.0), (11, gap_s, 2, 2.0), (12, 2 * gap_s + 1, 2, 2.0),
        # user 3: single event sitting exactly on a bucket edge
        (20, 1800, 3, 5.0),
    ]
    ev = _df(spark, spec)
    got = _rows(sessionize_partitioned(ev, bucket_us=bucket_us))
    assert got == _rows(sessionize(ev))
    by_user = {}
    for user_id, *_ in got:
        by_user[user_id] = by_user.get(user_id, 0) + 1
    assert by_user == {1: 1, 2: 2, 3: 1}


def test_randomized_parity_across_bucket_widths(spark):
    """Deterministic fuzz: random gaps clustered around GAP_US, several
    users, three bucket widths incl. one smaller than the gap."""
    rng = random.Random(20260819)
    spec = []
    eid = 0
    for user in range(1, 9):
        t = rng.randrange(0, 3600)
        for _ in range(120):
            spec.append((eid, t, user, rng.randrange(-50, 50) / 10))
            eid += 1
            # mix sub-gap steps with just-at/just-over gap steps
            t += rng.choice([30, 600, 1799, 1800, 1801, 5400])
    ev = _df(spark, spec)
    expect = _rows(sessionize(ev))
    for bucket_us in (900 * 1_000_000, SESSION_BUCKET_US,
                      86400 * 1_000_000):
        assert _rows(sessionize_partitioned(ev, bucket_us=bucket_us)) \
            == expect, f"bucket_us={bucket_us}"


def test_hot_user_scan_is_bounded(spark):
    """A bot user with 100x the events of everyone else: under the plain
    plan its whole event list lands in ONE window task; under the
    partitioned plan the largest (user_id, bucket) group is bounded by
    its per-bucket density — here 100x smaller."""
    from pyspark.sql import functions as F

    spec = []
    # 50 normal users, 20 events each over ~14 h
    eid = 0
    for user in range(2, 52):
        for k in range(20):
            spec.append((eid, 2500 * k, user, 1.0))
            eid += 1
    # the bot: 2000 events uniformly over the same 14 h (dense: 25 s apart)
    for k in range(2000):
        spec.append((eid, 25 * k, 1, 0.1))
        eid += 1
    ev = _df(spark, spec)

    bucket_us = 1800 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = (ev.groupBy("user_id").count()
                .agg(F.max("count")).first()[0])
    per_task_key = (ev.groupBy(
        "user_id", F.call_function(
            "div", us, F.lit(bucket_us).cast("long")).alias("bucket"))
        .count().agg(F.max("count")).first()[0])
    # the hot user's scan shrinks by its time spread (28 buckets here)
    assert per_user == 2000
    assert per_task_key * 10 <= per_user, (per_task_key, per_user)

    # and the answers still agree
    assert _rows(sessionize_partitioned(ev, bucket_us=bucket_us)) \
        == _rows(sessionize(ev))


def test_phase_keys_in_plan(spark):
    """Plan pin: the event-scale window shuffles on (user_id, bucket);
    raw-user_id partitioning appears only downstream of the run
    aggregation (phase 2's input is runs, not events)."""
    from ocr_platform_spark.operators.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sessionize_partitioned(ev).explain("formatted")
    p = buf.getvalue()
    assert "hashpartitioning(user_id" in p
    # the two-column phase-1 key must exist: user_id together with bucket
    assert any("bucket" in line and "hashpartitioning(user_id" in line
               for line in p.splitlines()), p
