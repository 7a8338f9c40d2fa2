"""PageRank over the synthesized host graph: the integer recurrence is
pinned by an independent pure-Python replica, plus structural properties
(sink floor, determinism) the fixed-point math must hold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.operators.webgraph import (
    _BASE_X1E6, _DAMP_DEN, _DAMP_NUM, _INIT_X1E6, N_HOSTS, PR_ITERS,
    wg_pagerank)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from ocr_platform_spark.session import build_spark
    return build_spark("webgraph-tests", cores=4)


def _python_pagerank(edges: set) -> dict:
    """Independent replica of the integer recurrence."""
    hosts = {h for e in edges for h in e}
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {h: _INIT_X1E6 for h in hosts}
    for _ in range(PR_ITERS):
        in_sum = {h: 0 for h in hosts}
        for s, d in edges:
            in_sum[d] += rank[s] // outdeg[s]
        rank = {h: _BASE_X1E6 + (_DAMP_NUM * in_sum[h]) // _DAMP_DEN
                for h in hosts}
    return rank


def _edges_from_parquet() -> set:
    import duckdb
    rows = duckdb.connect().execute(
        f"""SELECT DISTINCT o_custkey % {N_HOSTS},
                   (o_orderkey * 7 + 3) % {N_HOSTS}
            FROM read_parquet('{SF_DIR}/orders.parquet')
            WHERE o_orderkey < 5000
              AND o_custkey % {N_HOSTS} <> (o_orderkey * 7 + 3) % {N_HOSTS}
         """).fetchall()
    return {(int(a), int(b)) for a, b in rows}


def test_pagerank_matches_python_replica(spark):
    got = {r["host"]: r["rank_x1e6"]
           for r in wg_pagerank(spark, SF_DIR).collect()}
    want = {f"h{h}": r for h, r in _python_pagerank(_edges_from_parquet()).items()}
    assert got == want


def test_pagerank_rank_floor_and_spread(spark):
    out = wg_pagerank(spark, SF_DIR).collect()
    ranks = [r["rank_x1e6"] for r in out]
    # every host gets at least the teleport mass
    assert min(ranks) >= _BASE_X1E6
    # the graph is non-uniform, so ranks must actually discriminate
    assert len(set(ranks)) > 1


def test_pagerank_is_deterministic(spark):
    a = sorted((r["host"], r["rank_x1e6"])
               for r in wg_pagerank(spark, SF_DIR).collect())
    b = sorted((r["host"], r["rank_x1e6"])
               for r in wg_pagerank(spark, SF_DIR).collect())
    assert a == b
