"""Exact-integer Lloyd's k-means over the embeddings table — the corpus
clustering step of a training-data pipeline (topic balancing, dedup-aware
sampling, cluster-level mixing all start from "assign every document
embedding to a centroid"), and the second iterative-refinement operator in
the repo next to wg_pagerank's damped recurrence.

Reference parity: the reference clusters its catalog by metadata buckets
(texts listing filters); the embedding-space generalization is the
beyond-reference training-data family (SURVEY.md §2.7).

Determinism (the whole point of this formulation): float32 embeddings are
quantized ONCE to int64 fixed-point — ``floor(x * 2^20)`` is exact in
binary floating point (float32→double widening and scaling by a power of
two are both lossless), so Spark and the pure-Python oracle quantize to
the SAME integers — and every subsequent step is integer arithmetic:
squared-L2 distances in int64 (|q| ≤ 0.53·2^20 → Σ64 diff² < 2^47),
argmin ties break to the lowest centroid index in both engines
(array_position finds the FIRST minimum; Python min() keeps the first),
centroid updates floor-divide elementwise dimension sums by cluster
counts with Python ``//`` on the driver. Five iterations produce
bit-identical assignments in any engine.

Shape at scale (10^9-10^12 vectors): the quantized base relation is
persisted once; each iteration is ONE scan + ONE map-side-combined
aggregate into at most k rows (the 64 per-dimension sums combine
partially on every executor — no shuffle of vectors, only of k×(d+1)
partial rows), and the centroid state that crosses iterations is k×d
int64s on the driver — folded back into the next plan as literals, the
broadcast-model pattern, so plan depth stays CONSTANT across iterations
(no lineage growth, no checkpoint needed; contrast wg_pagerank, whose
per-iteration JOIN genuinely needs the lineage cut). Assignment is pure
projection: k JVM-side aggregate expressions, no UDF, no per-row Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.registry import assert_fixture_scale
from ocr_platform_spark.operators.tables import load

K = 10          # == the synthetic table's label cardinality
ITERS = 5
DIM = 64
Q_SCALE = 2 ** 20


# --- shared quantization -------------------------------------------------
def quantize(vals) -> list[int]:
    return [math.floor(float(v) * Q_SCALE) for v in vals]


# --- pure-Python reference (the fixture oracle runs this sequentially) ---
def python_kmeans(rows: list[tuple[int, list[float]]],
                  k: int = K, iters: int = ITERS):
    """rows: (vec_id, embedding floats) → (assignments, centroids) where
    assignments = [(vec_id, cluster, dist)] under the FINAL centroids."""
    rows = sorted(rows)
    qv = {vid: quantize(v) for vid, v in rows}
    cents = [qv[vid] for vid, _ in rows[:k]]

    def nearest(q: list[int]) -> tuple[int, int]:
        best_j, best_d = 0, None
        for j, c in enumerate(cents):
            d = sum((a - b) * (a - b) for a, b in zip(q, c))
            if best_d is None or d < best_d:
                best_j, best_d = j, d
        return best_j, best_d

    for _ in range(iters):
        sums = [[0] * len(cents[0]) for _ in range(k)]
        cnts = [0] * k
        for vid, _ in rows:
            j, _d = nearest(qv[vid])
            cnts[j] += 1
            for i, x in enumerate(qv[vid]):
                sums[j][i] += x
        cents = [[s // c for s in sums[j]] if (c := cnts[j]) else cents[j]
                 for j in range(k)]
    assign = [(vid, *nearest(qv[vid])) for vid, _ in rows]
    return assign, cents


# --- Spark side ----------------------------------------------------------
def _quantized(emb: DataFrame) -> DataFrame:
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(float(Q_SCALE)))
        .cast("long"))
    return emb.select("vec_id", q.alias("q"))


def _dist_to(centroid: list[int]) -> Column:
    lit = F.array(*[F.lit(v).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with("q", lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def spark_kmeans(emb: DataFrame, k: int = K, iters: int = ITERS,
                 dim: int = DIM) -> DataFrame:
    """embeddings(vec_id, embedding) → (vec_id, cluster, dist) — exact
    integer Lloyd's, bit-identical to python_kmeans."""
    base = _quantized(emb).persist()
    # deterministic init: the k smallest vec_ids (id order, not row
    # order). Production would seed with k-means|| (Bahmani et al.,
    # VLDB'12 — an O(log n)-pass oversampling init that is itself a
    # chain of map-side-combined aggregates); the naive seed keeps the
    # cross-engine determinism contract trivial to audit, and the GATE
    # pins assignment exactness, not clustering quality.
    seed_rows = (base.orderBy("vec_id").limit(k).collect())
    cents = [list(r["q"]) for r in sorted(seed_rows,
                                          key=lambda r: r["vec_id"])]

    def assigned(*extra: str) -> DataFrame:
        darr = F.array(*[_dist_to(c) for c in cents])
        return base.select(
            "vec_id", *extra,
            (F.array_position(darr, F.array_min(darr)) - 1)
            .cast("long").alias("cluster"),
            F.array_min(darr).alias("dist"))

    for _ in range(iters):
        # assignment + per-dimension sums in ONE projection + ONE
        # map-side-combined aggregate — no join back onto the vectors
        stats = (assigned("q")
                 .groupBy("cluster")
                 .agg(F.count("*").alias("n"),
                      *[F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                        for i in range(dim)])
                 .collect())
        by_j = {int(r["cluster"]): r for r in stats}
        cents = [[int(r[f"s{i}"]) // int(r["n"]) for i in range(dim)]
                 if (r := by_j.get(j)) is not None else cents[j]
                 for j in range(k)]
    out = assigned()
    base.unpersist()
    return out


def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    assert_fixture_scale(sf_dir, "ml_kmeans")
    return spark_kmeans(load(spark, sf_dir, "embeddings"))


# --- embedding outlier detection -------------------------------------------
# The data-poisoning / noise filter clustering exists for: a vector far
# from its OWN cluster's centroid is mislabeled, corrupted, or
# adversarial, and embedding-space curation drops or audits it
# (cluster-then-filter is the standard recipe — e.g. SemDeDup-style
# embedding curation). Threshold = 1.05x the cluster's mean squared
# distance, all integer (the synthetic high-dim embeddings concentrate
# tightly, so 5% above mean is a real tail — 82/500 flagged at sf0.01).
# Shape at scale: the per-cluster (sum, n) aggregate combines map-side
# into k rows, which BROADCAST back onto the assignment projection —
# nothing but the k-row stats ever crosses an exchange twice. Oracle =
# live SQL over the ml_kmeans fixture (the cx_canonical_dedup pattern:
# the fixture pins the iterative kernel, the composition stays SQL).

OUTLIER_NUM, OUTLIER_DEN = 21, 20      # threshold = mean * 1.05


def outlier_flags(assign: DataFrame) -> DataFrame:
    """(vec_id, cluster, dist) → + (thr, is_outlier): flag vectors whose
    squared distance to their own centroid exceeds 1.05x the cluster
    mean."""
    stats = (assign.groupBy("cluster")
             .agg(F.sum("dist").alias("s"), F.count("*").alias("n"))
             .select("cluster", F.expr(
                 f"((s DIV n) * {OUTLIER_NUM}) DIV {OUTLIER_DEN}")
                 .cast("long").alias("thr")))
    return (assign.join(F.broadcast(stats), "cluster")
            .select("vec_id", "cluster", "dist", "thr",
                    (F.col("dist") > F.col("thr")).alias("is_outlier")))


def ml_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    assert_fixture_scale(sf_dir, "ml_kmeans")
    return outlier_flags(spark_kmeans(load(spark, sf_dir, "embeddings")))


def _outlier_sql() -> str:
    from ocr_platform_spark.operators.registry import fixture_sql

    return f"""
WITH a AS ({fixture_sql("ml_kmeans.sf0.01.parquet")}),
s AS (
  SELECT cluster,
         ((CAST(sum(dist) AS BIGINT) // count(*)) * {OUTLIER_NUM})
             // {OUTLIER_DEN} AS thr
  FROM a GROUP BY cluster)
SELECT a.vec_id, a.cluster, a.dist, CAST(s.thr AS BIGINT) AS thr,
       a.dist > s.thr AS is_outlier
FROM a JOIN s USING (cluster)
"""


QUERIES: dict = {
    # wave 28: embedding outlier flags over the k-means assignment,
    # beyond-window (local-gate record; ml_kmeans itself is registered
    # in registry.py with the fixture oracle)
    "ml_outlier_flags": (ml_outlier_flags, _outlier_sql()),
}
