"""Web-graph domain authority: PageRank over the host link graph — the
ranking Common Crawl publishes per crawl (host/domain-level PageRank and
harmonic centrality) and curation pipelines join back onto documents as a
quality prior.

Determinism: the whole computation is INTEGER arithmetic — ranks are
fixed-point x1e6, every division is floor (Spark ``DIV``, DuckDB ``//``)
— so ten iterations produce bit-identical values in any engine; the
DuckDB oracle is the same recurrence unrolled into ten CTE stages by a
Python loop at import time.

Shape at scale (the CC host graph is ~10^8 hosts / 10^10 edges): the
edge list joins rank on src and aggregates on dst — one shuffle join +
one map-side-combined aggregate per iteration, both keyed on host ids;
the static (edges ⋈ outdeg) relation is persisted once and reused by all
iterations; rank lineage is cut every iteration (dd_clusters' pattern:
reliable checkpoint when a checkpoint dir exists, else localCheckpoint)
so the plan stays flat instead of growing exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load

N_HOSTS = 50
PR_ITERS = 10
_DAMP_NUM, _DAMP_DEN = 85, 100     # damping 0.85 as an integer ratio
_BASE_X1E6 = 150_000               # (1 - d) * 1e6
_INIT_X1E6 = 1_000_000


def _edges(orders: DataFrame) -> DataFrame:
    """Deterministic host link graph synthesized from orders: an edge
    from host(o_custkey) to host(o_orderkey*7+3), self-loops dropped."""
    src = F.pmod(F.col("o_custkey"), F.lit(N_HOSTS))
    dst = F.pmod(F.col("o_orderkey") * 7 + 3, F.lit(N_HOSTS))
    return (orders.filter(F.col("o_orderkey") < 5000)
            .select(src.alias("src"), dst.alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct())


def pagerank_ranks(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """edges(src, dst) of any equi-joinable host type → (h, rank) after
    ``iters`` exact-integer damped iterations. The generic kernel: the
    driver query (wg_pagerank) feeds it the synthetic orders graph, the
    linkgraph plan (plans/linkgraph_job.py) the crawl's extracted hosts."""
    spark = edges.sparkSession
    hosts = (edges.select(F.col("src").alias("h"))
             .union(edges.select(F.col("dst").alias("h")))
             .distinct())
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    esrc = edges.join(outdeg, "src").persist()

    has_ckpt_dir = spark.sparkContext.getCheckpointDir() is not None

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if has_ckpt_dir \
            else df.localCheckpoint(eager=True)

    rank = hosts.withColumn("rank", F.lit(_INIT_X1E6).cast("long"))
    for _ in range(iters):
        insum = (esrc.join(rank, esrc["src"] == rank["h"])
                 .select(F.col("dst"),
                         F.expr("rank DIV deg").alias("c"))
                 .groupBy("dst").agg(F.sum("c").alias("in_sum")))
        rank = _cut(
            hosts.join(insum, hosts["h"] == insum["dst"], "left")
            .select(
                "h",
                (F.lit(_BASE_X1E6)
                 + F.expr(f"({_DAMP_NUM} * coalesce(in_sum, 0))"
                          f" DIV {_DAMP_DEN}"))
                .cast("long").alias("rank")))
    esrc.unpersist()
    return rank


def wg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    rank = pagerank_ranks(_edges(orders))
    return rank.select(
        F.concat(F.lit("h"), F.col("h").cast("string")).alias("host"),
        F.col("rank").alias("rank_x1e6"))


def _pagerank_sql(iters: int = PR_ITERS) -> str:
    """The identical integer recurrence, unrolled into one CTE per
    iteration (recursive CTEs cannot aggregate in the recursive term)."""
    sql = f"""
WITH edges AS (
  SELECT DISTINCT o_custkey % {N_HOSTS} AS src,
                  (o_orderkey * 7 + 3) % {N_HOSTS} AS dst
  FROM orders
  WHERE o_orderkey < 5000
    AND o_custkey % {N_HOSTS} <> (o_orderkey * 7 + 3) % {N_HOSTS}),
hosts AS (
  SELECT DISTINCT h FROM (
    SELECT src AS h FROM edges UNION SELECT dst FROM edges)),
outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT h, CAST({_INIT_X1E6} AS BIGINT) AS rank FROM hosts)"""
    for i in range(1, iters + 1):
        sql += f""",
r{i} AS (
  SELECT h.h,
         CAST({_BASE_X1E6} + ({_DAMP_NUM} * coalesce(s.in_sum, 0))
              // {_DAMP_DEN} AS BIGINT) AS rank
  FROM hosts h LEFT JOIN (
    SELECT e.dst AS h, sum(r.rank // d.deg) AS in_sum
    FROM edges e
    JOIN r{i - 1} r ON r.h = e.src
    JOIN outdeg d ON d.src = e.src
    GROUP BY e.dst) s ON s.h = h.h)"""
    sql += (f"\nSELECT 'h' || CAST(h AS VARCHAR) AS host,"
            f" rank AS rank_x1e6 FROM r{iters}")
    return sql


WG_PAGERANK_SQL = _pagerank_sql()


QUERIES: dict = {
    "wg_pagerank": (wg_pagerank, WG_PAGERANK_SQL),
}
