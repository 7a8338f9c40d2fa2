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


def _python_harmonic(edges: set, iters: int) -> dict:
    """Independent replica: per-source BFS over out-edges, H(v) summed as
    floor(1e6/d) over sources u with d(u, v) <= iters."""
    hosts = {h for e in edges for h in e}
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    harm = {h: 0 for h in hosts}
    for u in hosts:
        dist = {u: 0}
        frontier = [u]
        for d in range(1, iters + 1):
            nxt = []
            for x in frontier:
                for y in adj.get(x, ()):
                    if y not in dist:
                        dist[y] = d
                        nxt.append(y)
            frontier = nxt
        for v, d in dist.items():
            if v != u:
                harm[v] += 1_000_000 // d
    return harm


def test_harmonic_matches_python_replica(spark):
    from ocr_platform_spark.operators.webgraph import HC_ITERS, wg_harmonic

    got = {r["host"]: r["harm_x1e6"]
           for r in wg_harmonic(spark, SF_DIR).collect()}
    want = {f"h{h}": v
            for h, v in _python_harmonic(_edges_from_parquet(),
                                         HC_ITERS).items()}
    assert got == want


def test_harmonic_tiny_chain(spark):
    # 1 -> 2 -> 3: H(2) = 1/1, H(3) = 1/1 + 1/2, H(1) = 0
    from ocr_platform_spark.operators.webgraph import harmonic_ranks

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    got = {r["h"]: r["harm"] for r in harmonic_ranks(edges, 6).collect()}
    assert got == {1: 0, 2: 1_000_000, 3: 1_500_000}


# --- connected components (alternating two-star) ---------------------------

def _cc_edges_from_parquet() -> set:
    import duckdb

    from ocr_platform_spark.operators.webgraph import (
        CC_CLASSES, CC_NODES_PER_CLASS)

    rows = duckdb.connect().execute(
        f"""SELECT DISTINCT
                (o_custkey % {CC_CLASSES})
                  + {CC_CLASSES} * (o_custkey % {CC_NODES_PER_CLASS}),
                (o_custkey % {CC_CLASSES})
                  + {CC_CLASSES} * ((o_orderkey * 7 + 3)
                                    % {CC_NODES_PER_CLASS})
            FROM read_parquet('{SF_DIR}/orders.parquet')
            WHERE o_orderkey % 11 < 2""").fetchall()
    return {(int(a), int(b)) for a, b in rows if a != b}


def _union_find(edges: set) -> dict:
    """Independent replica: classic path-compressed union-find, then the
    min node id of each set as the component label."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict = {}
    for n in list(parent):
        comps.setdefault(find(n), []).append(n)
    return {n: min(members)
            for root, members in comps.items() for n in members}


def test_components_match_union_find(spark):
    from ocr_platform_spark.operators.webgraph import wg_components

    got = {r["host"]: (r["component_id"], r["n_nodes"])
           for r in wg_components(spark, SF_DIR).collect()}
    labels = _union_find(_cc_edges_from_parquet())
    sizes: dict = {}
    for n, c in labels.items():
        sizes[c] = sizes.get(c, 0) + 1
    want = {f"h{n}": (c, sizes[c]) for n, c in labels.items()}
    assert got == want


def test_components_never_span_residue_classes(spark):
    # every edge stays inside its class ⇒ node ≡ component_id (mod 16)
    from ocr_platform_spark.operators.webgraph import (
        CC_CLASSES, wg_components)

    for r in wg_components(spark, SF_DIR).collect():
        node = int(r["host"][1:])
        assert node % CC_CLASSES == r["component_id"] % CC_CLASSES


def test_two_star_log_rounds_on_long_path(spark):
    # a permuted 200-node path has diameter 199: min-label propagation
    # (dd_clusters) needs ~199 shuffle rounds; two-star must finish in
    # O(log n) — the scale property this kernel exists for. Empirically 8
    # rounds; the bound leaves headroom without admitting linear behavior.
    from ocr_platform_spark.operators.webgraph import _two_star_rounds

    ids = [(i * 97) % 211 for i in range(200)]
    assert len(set(ids)) == 200
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(199)], "src long, dst long")
    labels, rounds = _two_star_rounds(edges)
    assert rounds <= 14
    rows = labels.collect()
    assert len(rows) == 200
    assert {r["component_id"] for r in rows} == {0}


def test_two_star_isolated_pair_and_empty(spark):
    from ocr_platform_spark.operators.webgraph import two_star_components

    pair = spark.createDataFrame([(7, 3)], "src long, dst long")
    got = {r["node"]: r["component_id"]
           for r in two_star_components(pair).collect()}
    assert got == {7: 3, 3: 3}

    empty = spark.createDataFrame([], "src long, dst long")
    assert two_star_components(empty).count() == 0
