"""Exact-integer k-means: cross-engine parity on hand-built vectors,
empty-cluster survival, quantization exactness, and fixture sanity."""

from __future__ import annotations

import math

import pytest

from ocr_platform_spark.operators.kmeans import (
    Q_SCALE, python_kmeans, quantize, spark_kmeans)


@pytest.fixture(scope="module")
def spark():
    from ocr_platform_spark.session import build_spark
    return build_spark("kmeans-tests", cores=4)


def _df(spark, rows):
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType)
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False)])
    return spark.createDataFrame(rows, schema)


def test_quantize_is_exact_for_float32():
    # float32 -> double widening and *2^20 are lossless; floor is floor
    import struct
    for v in (0.054249506, -0.5252062, 0.45837352, 0.0, -1e-9):
        f32 = struct.unpack("f", struct.pack("f", v))[0]
        assert quantize([f32]) == [math.floor(f32 * Q_SCALE)]


def test_spark_matches_python_small(spark):
    import random
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-0.5, 0.5) for _ in range(4)])
            for i in range(24)]
    # float32-ify exactly as parquet storage would
    import struct
    rows = [(i, [struct.unpack("f", struct.pack("f", x))[0] for x in v])
            for i, v in rows]
    want, _ = python_kmeans(rows, k=3, iters=3)
    got = sorted(map(tuple, spark_kmeans(
        _df(spark, rows), k=3, iters=3, dim=4).collect()))
    assert got == sorted(want)


def test_empty_cluster_keeps_centroid(spark):
    # two seed points coincide -> one centroid never wins a point;
    # both engines must keep it frozen instead of dividing by zero
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.25, 0.25]),
            (3, [0.26, 0.25]), (4, [-0.25, -0.25])]
    want, cents = python_kmeans(rows, k=2, iters=4)
    got = sorted(map(tuple, spark_kmeans(
        _df(spark, rows), k=2, iters=4, dim=2).collect()))
    assert got == sorted(want)
    # ties in the duplicate seeds resolve to the FIRST (lowest) index
    assert {c for _, c, _ in want} <= {0, 1}


def test_fixture_is_balanced_and_total():
    import duckdb
    f = "tests/fixtures/oracle/ml_kmeans.sf0.01.parquet"
    rows = duckdb.connect().execute(
        f"SELECT cluster, COUNT(*) FROM read_parquet('{f}') "
        "GROUP BY 1").fetchall()
    assert sum(c for _, c in rows) == 500
    assert len(rows) == 10          # no cluster emptied on real data
    assert max(c for _, c in rows) <= 150   # no degenerate collapse


def test_assignment_plan_is_pure_projection(spark):
    """The per-iteration scale claim: assignment adds NO exchange and NO
    join above the quantized base — k distance expressions fold into one
    projection; only the <=k-row stats aggregate ever shuffles."""
    from pyspark.sql import functions as F

    from ocr_platform_spark.operators.kmeans import _dist_to, _quantized

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    base = _quantized(emb)
    cents = [list(r["q"]) for r in base.orderBy("vec_id").limit(3).collect()]
    darr = F.array(*[_dist_to(c) for c in cents])
    asg = base.select(
        "vec_id", (F.array_position(darr, F.array_min(darr)) - 1).alias("c"))
    p = asg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Join" not in p


SF_DIR = "/root/testdata/sf0.01"


# --- embedding outlier flags -------------------------------------------------

def test_outlier_flags_match_python_and_are_live(spark):
    """Flags must equal a pure-Python recompute over the assignment, and
    the 1.05x-mean threshold must flag a real tail (both classes live
    in every cluster's corpus-wide union)."""
    from ocr_platform_spark.operators.kmeans import (OUTLIER_DEN,
                                                     OUTLIER_NUM,
                                                     ml_outlier_flags,
                                                     ml_kmeans)

    assign = {r["vec_id"]: (r["cluster"], r["dist"])
              for r in ml_kmeans(spark, SF_DIR).collect()}
    sums: dict = {}
    for c, d in assign.values():
        s, n = sums.get(c, (0, 0))
        sums[c] = (s + d, n + 1)
    thr = {c: ((s // n) * OUTLIER_NUM) // OUTLIER_DEN
           for c, (s, n) in sums.items()}
    rows = ml_outlier_flags(spark, SF_DIR).collect()
    assert len(rows) == len(assign)                    # never-drop
    for r in rows:
        c, d = assign[r["vec_id"]]
        assert (r["cluster"], r["dist"], r["thr"]) == (c, d, thr[c])
        assert r["is_outlier"] == (d > thr[c])
    n_out = sum(r["is_outlier"] for r in rows)
    assert 0 < n_out < len(rows)


def test_outlier_stats_broadcast(spark):
    """The k-row cluster stats must broadcast back onto the assignment
    (no shuffle join against a 10-row table)."""
    from ocr_platform_spark.operators.kmeans import ml_outlier_flags

    plan = ml_outlier_flags(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
