"""Z-order layout keys + the file-skipping measurement
(operators/zorder.py)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ocr_platform_spark.operators.zorder import (cx_zorder_key,
                                                 linear_layout,
                                                 with_zkey, zorder_key,
                                                 zorder_layout)

SF_DIR = "/root/testdata/sf0.01"


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for k in range(bits):
        z |= ((a >> k) & 1) << (2 * k)
        z |= ((b >> k) & 1) << (2 * k + 1)
    return z


def test_zorder_key_matches_reference_bits(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 149, 65535, 65536 + 3)
         for b in (0, 2, 29, 65535)], "a long, b long")
    rows = df.select("a", "b", zorder_key(F.col("a"), F.col("b"))
                     .alias("z")).collect()
    for r in rows:
        assert r["z"] == _py_morton(r["a"] & 0xFFFF, r["b"] & 0xFFFF)
    # locality: adjacent in either dim stays within a couple of bits
    assert _py_morton(5, 7) ^ _py_morton(4, 7) == 0b1
    assert _py_morton(5, 7) ^ _py_morton(5, 6) == 0b10


def test_driver_query_normalizes_then_interleaves(spark):
    rows = cx_zorder_key(spark, SF_DIR).collect()
    lu, hu = (min(r["user_id"] for r in rows),
              max(r["user_id"] for r in rows))
    ld, hd = min(r["day"] for r in rows), max(r["day"] for r in rows)
    for r in rows[:200]:
        u16 = (r["user_id"] - lu) * 65535 // (hu - lu)
        d16 = (r["day"] - ld) * 65535 // (hd - ld)
        assert r["zkey"] == _py_morton(u16, d16)
        assert 0 <= r["day"] <= 30


def _skippable(path: str, col: str, value: int) -> tuple[int, int]:
    """(files whose row-group stats exclude value, total files) — the
    real pruning arithmetic a scan performs."""
    skippable = total = 0
    for f in glob.glob(f"{path}/*/part-*.parquet"):
        total += 1
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        if not (lo <= value <= hi):
            skippable += 1
    return skippable, total


def test_zorder_layout_prunes_both_dims_linear_only_one(spark, tmp_path):
    from ocr_platform_spark.operators.tables import load

    ev = load(spark, SF_DIR, "events")
    zp, lp = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_layout(ev, zp)
    linear_layout(ev, lp)

    users, days = (3, 75, 140), (2, 15, 29)
    z_user = [_skippable(zp, "user_id", v)[0] for v in users]
    z_day = [_skippable(zp, "day", v)[0] for v in days]
    l_user = [_skippable(lp, "user_id", v)[0] for v in users]
    l_day = [_skippable(lp, "day", v)[0] for v in days]
    assert _skippable(zp, "day", 2)[1] == 8
    # the linear (time-bucketed) layout prunes day slices perfectly but
    # can never skip a user slice: every file spans all users
    assert l_user == [0, 0, 0]
    assert l_day == [7, 7, 7]
    # z-order's top-3-bit files are the (day-half, user-half,
    # day-quarter) grid: a user probe excludes the 4 other-half files,
    # a day probe all 6 other-quarter files — exact, deterministic
    assert z_user == [4, 4, 4], z_user
    assert z_day == [6, 6, 6], z_day
    # net: both dims prune under z-order; only one under linear
    assert sum(z_user) + sum(z_day) > sum(l_user) + sum(l_day)
    # and the layouts hold identical data
    assert (spark.read.parquet(zp).count()
            == spark.read.parquet(lp).count()
            == with_zkey(ev).count())
