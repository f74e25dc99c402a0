"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: exact baseline (cross join pruned to the
  query set, window top-k) — correct at any k, cost O(Q*N).
- Random-hyperplane LSH ANN: deterministic hyperplanes (seeded),
  candidates restricted to matching buckets (with multi-probe via
  several tables), then exact re-rank — the 100 TB path where Q*N is
  not affordable.
- IVF ANN: k-means coarse quantizer (spark.ml, seeded), vectors
  assigned to inverted lists; queries probe the nearest n_probe
  centroids and re-rank exactly within those cells — candidate set
  ~ N * n_probe / n_cells.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import SEED
from .dedup import _cosine

# 16 tables x 4 planes: for a neighbour at cosine ~0.4 (angle ~66deg,
# per-plane agreement ~0.63) detection = 1-(1-0.63^4)^16 ~ 0.94 — tuned
# for recall on near-orthogonal high-dim embeddings; raise tables for
# higher recall at scale (candidates/table ~ N/16).
LSH_TABLES = 16
LSH_PLANES = 4


def embeddings_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def knn_bruteforce(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, include_self: bool = False
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    queries: (query_id, qv array<double>). Deterministic ordering:
    cosine desc, vec_id asc; score rounded to 6 decimals.
    """
    base = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    j = queries.crossJoin(base)
    if not include_self:
        j = j.filter(F.col("query_id") != F.col("vec_id"))
    j = j.withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        j.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def self_queries(embeddings: DataFrame, n_queries: int = 10) -> DataFrame:
    """First n vectors (by vec_id) as the query set."""
    return (
        embeddings.orderBy("vec_id")
        .limit(n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.default_rng([SEED, 7])
    return rng.standard_normal((LSH_TABLES, LSH_PLANES, dim))


def _bucket_expr(vcol, planes: np.ndarray):
    """Sign-bit bucket id for one table: bit p = 1 iff dot(v, plane_p) > 0."""
    bits = []
    for p in range(planes.shape[0]):
        w = planes[p].tolist()
        dot = F.aggregate(
            F.zip_with(vcol, F.array(*[F.lit(float(x)) for x in w]), lambda a, b: a * b),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0])


def ivf_fit(embeddings: DataFrame, n_cells: int = 16, seed: int = SEED):
    """Fit the IVF coarse quantizer: k-means over the embeddings
    (distributed, seeded). Returns (model, assigned) where assigned =
    (vec_id, v, cell)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("features", array_to_vector("v"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(base)
    assigned = model.transform(base).select("vec_id", "v", "cell")
    return model, assigned


def ivf_knn(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN: probe the n_probe nearest cells per query, exact cosine
    re-rank inside. One equi-join on cell — never a full cross join."""
    import numpy as np

    model, assigned = ivf_fit(embeddings, n_cells)
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])

    def probe_cells(qv: list[float]) -> list[int]:
        q = np.asarray(qv)
        d = ((centers - q) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d)[:n_probe]]

    # centroids are tiny: compute probe lists on the driver per query row
    q_rows = queries.select("query_id", "qv").collect()
    spark = embeddings.sparkSession
    probe = spark.createDataFrame(
        [(r.query_id, list(r.qv), c) for r in q_rows for c in probe_cells(r.qv)],
        "query_id long, qv array<double>, cell int",
    )
    cand = probe.join(assigned, "cell").filter(F.col("query_id") != F.col("vec_id"))
    scored = cand.withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ann_lsh(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets (8 tables x 64
    buckets), exact cosine re-rank within the union of matching buckets.

    One shuffle on (table, bucket); candidate set is ~N/8 per table —
    at 100 TB this replaces the full scan per query.
    """
    planes = _hyperplanes(dim)
    base = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    b_rows = base.select(
        "vec_id", "v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), _bucket_expr(F.col("v"), planes[t]).alias("bkt"))
                    for t in range(LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "v", "tb.tbl", "tb.bkt")
    q_rows = queries.select(
        "query_id", "qv",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), _bucket_expr(F.col("qv"), planes[t]).alias("bkt"))
                    for t in range(LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("query_id", "qv", "tb.tbl", "tb.bkt")
    cand = (
        q_rows.join(b_rows, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "qv", "vec_id", "v")
        .distinct()
    )
    scored = cand.withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
