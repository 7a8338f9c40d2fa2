"""Similarity search over an embedding column (array<float>).

Two paths, per the training-pipeline brief:
- brute-force cosine top-k — the exactness baseline (SQL-oracled against
  DuckDB's list_cosine_similarity, bit-for-bit double math);
- LSH-bucketed ANN — the scale path: random-hyperplane signatures computed
  JVM-side from seeded xxhash64-derived hyperplanes, candidates only within
  matching buckets. At 10^12 rows the brute-force cross join is impossible;
  the LSH variant's cost is O(n · bucket_size).

All vector math is sequential-fold double arithmetic (see dedup._cos_expr)
so results hash-match DuckDB exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_platform_spark.operators.dedup import _cos_expr
from ocr_platform_spark.operators.tables import load

TOP_K = 10
N_QUERIES = 5
# Testdata embeddings are near-orthogonal random 64-dim vectors — the
# hardest case for hyperplane LSH (all angles ≈ 90°). 4 planes × 12 tables
# gives recall@10 ≈ 0.75 here (asserted ≥ 0.5 in pytest); real clustered
# embeddings at scale warrant more planes (deeper buckets, fewer candidates).
LSH_PLANES = 4
LSH_TABLES = 12


def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors (by cosine) for the first N_QUERIES vectors.
    Rank ties broken by neighbor id — deterministic output set."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = (emb.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("vq")))
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vn"))
    pairs = q.join(n, F.col("query_id") != F.col("neighbor_id"))
    cos = _cos_expr("vq", "vn")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (pairs.withColumn("cos", cos)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "rank",
                    F.floor(F.col("cos") * 1e6).cast("long").alias("cos_x1e6")))


ANN_BRUTE_SQL = f"""
SELECT query_id, neighbor_id, rank, CAST(floor(cos * 1e6) AS BIGINT) AS cos_x1e6
FROM (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(n.embedding AS DOUBLE[])) AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                           CAST(n.embedding AS DOUBLE[])) DESC,
                    n.vec_id ASC) AS rank
  FROM embeddings q JOIN embeddings n ON q.vec_id != n.vec_id
  WHERE q.vec_id < {N_QUERIES}) t
WHERE rank <= {TOP_K}
"""


# --- LSH-bucketed ANN (scale path; rows-only driver check) ----------------

def _hyperplane_sign(v_col: str, table: int, plane: int) -> F.Column:
    """Sign of <v, h> for a pseudo-random hyperplane h whose components are
    derived JVM-side: h_i = (xxhash64(table, plane, i) / 2^63) ∈ [-1, 1).
    Deterministic, seedable, and requires no broadcast of plane matrices."""
    expr = (
        "aggregate(zip_with({v}, sequence(0, size({v}) - 1), (x, i) -> "
        "x * (CAST(xxhash64({t}, {p}, i) AS DOUBLE) / 9.223372036854776e18)), "
        "CAST(0 AS DOUBLE), (acc, y) -> acc + y)"
    ).format(v=v_col, t=table, p=plane)
    return (F.expr(expr) > 0).cast("int")


def _bucket_col(v_col: str, table: int, n_planes: int) -> F.Column:
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = F.shiftleft(bucket, 1) + _hyperplane_sign(v_col, table, p)
    return bucket


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing an LSH bucket with
    the query in ANY of LSH_TABLES tables; exact cosine re-rank within
    candidates. Recall vs ann_brute_topk is asserted in pytest."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    # one pass: all LSH_TABLES bucket ids per row via posexplode (vs
    # LSH_TABLES unioned scans, each re-folding the hyperplane dot products)
    all_buckets = F.array(*[
        _bucket_col("v", t, LSH_PLANES) for t in range(LSH_TABLES)])
    banded = emb.select(
        "vec_id", "v", F.posexplode(all_buckets).alias("tbl", "bucket"))
    q = (banded.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("vq"),
                 "tbl", "bucket"))
    n = banded.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("v").alias("vn"), "tbl", "bucket")
    cand = (q.join(n, ["tbl", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "vq", "vn")
            .dropDuplicates(["query_id", "neighbor_id"]))
    cos = _cos_expr("vq", "vn")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (cand.withColumn("cos", cos)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "rank"))


# --- IVF ANN (coarse k-means quantizer + multi-probe; rows-only) ----------
IVF_CLUSTERS = 16
IVF_PROBES = 4  # probe the 4 nearest cells per query (recall/cost dial)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF: Spark-ML k-means partitions the corpus into IVF_CLUSTERS cells;
    each query exactly-ranks only vectors in its IVF_PROBES nearest cells.

    At 10^12 rows this is the classic inverted-file layout: the centroid
    table is tiny (broadcast), cell assignment is one map-side pass, and
    cells become the physical partitioning of the stored index — a probe
    reads ~PROBES/CLUSTERS of the corpus. Deterministic via fixed seed +
    deterministic init; recall vs ann_brute_topk asserted in pytest.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    feat = emb.withColumn("features", array_to_vector("v"))
    km = KMeans(k=IVF_CLUSTERS, seed=7, maxIter=10, initMode="random")
    model = km.fit(feat)
    assigned = model.transform(feat).select(
        "vec_id", "v", F.col("prediction").alias("cell"))

    # centroid table (tiny → broadcast); query → its IVF_PROBES nearest cells
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in
         enumerate(model.clusterCenters())],
        "cell int, cv array<double>")
    q = (assigned.filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("vq")))
    qc = q.join(F.broadcast(centers), how="cross")
    dist = F.expr(
        "aggregate(zip_with(vq, cv, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS DOUBLE), (acc, d) -> acc + d)")
    wq = Window.partitionBy("query_id").orderBy(F.asc("cell_dist"),
                                               F.asc("cell"))
    probes = (qc.withColumn("cell_dist", dist)
              .withColumn("pr", F.row_number().over(wq))
              .filter(F.col("pr") <= IVF_PROBES)
              .select("query_id", "vq", "cell"))

    # exact re-rank inside the probed cells only
    nb = assigned.select(F.col("vec_id").alias("neighbor_id"),
                         F.col("v").alias("vn"), "cell")
    cand = (probes.join(nb, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .dropDuplicates(["query_id", "neighbor_id"]))
    cos = _cos_expr("vq", "vn")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (cand.withColumn("cos", cos)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "rank"))


QUERIES: dict = {
    "ann_brute_topk": (ann_brute_topk, ANN_BRUTE_SQL),
    "ann_lsh_topk": (ann_lsh_topk, None),
    "ann_ivf_topk": (ann_ivf_topk, None),
}
