"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: exact baseline (cross join pruned to the
  query set, window top-k) — correct at any k, cost O(Q*N).
- Random-hyperplane LSH ANN: deterministic hyperplanes (seeded),
  candidates restricted to matching buckets (with multi-probe via
  several tables), then exact re-rank — the 100 TB path where Q*N is
  not affordable.
- IVF ANN: deterministic Lloyd k-means coarse quantizer (fixed init =
  smallest vec_ids, fixed iterations, centroids rounded to 6 decimals
  so the fit is reproducible bit-for-bit across engines and partition
  orders); vectors live in inverted lists; queries probe the nearest
  n_probe centroids via broadcast centroid expressions (never a
  driver-side collect of the query table) and re-rank exactly within
  those cells — candidate set ~ N * n_probe / n_cells.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import SEED
from .dedup import _cosine

# 16 tables x 4 planes (16 buckets/table): for a neighbour at cosine
# ~0.4 (angle ~66deg, per-plane agreement ~0.63) detection =
# 1-(1-0.63^4)^16 ~ 0.94 — tuned for top-k recall on near-orthogonal
# high-dim embeddings; raise tables for higher recall at scale
# (candidates/table ~ N/16).
LSH_TABLES = 16
LSH_PLANES = 4

# Near-dup candidate generation needs recall ~1 at the 0.45-cosine
# threshold, where per-plane agreement is ~0.65: 24 tables x 3 planes
# gives miss ~ (1-0.65^3)^24 ~ 5e-4 per pair (measured 0 misses at
# sf0.001/sf0.01/sf0.1); independent seed stream from the ANN tables.
NEARDUP_TABLES = 24
NEARDUP_PLANES = 3

IVF_CELLS = 16
IVF_PROBE = 4
IVF_ITERS = 3


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


def _neardup_hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.default_rng([SEED, 11])
    return rng.standard_normal((NEARDUP_TABLES, NEARDUP_PLANES, dim))


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


def _sqdist_expr(vcol, center: list[float]):
    """Fold-ordered squared L2 distance to a broadcast centroid literal
    (left fold over dims, same order as the truth-side mirror)."""
    carr = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vcol, carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def _cell_expr(vcol, cents: list[list[float]]):
    """argmin cell index over centroid literals; ties -> smallest index
    (struct array_min compares dist first, then index)."""
    structs = [
        F.struct(_sqdist_expr(vcol, c).alias("d"), F.lit(ci).alias("ci"))
        for ci, c in enumerate(cents)
    ]
    return F.array_min(F.array(*structs)).getField("ci")


def ivf_fit(
    embeddings: DataFrame, n_cells: int = IVF_CELLS, n_iters: int = IVF_ITERS
) -> tuple[list[list[float]], DataFrame]:
    """Fit the IVF coarse quantizer: deterministic Lloyd k-means.

    Init = the ``n_cells`` smallest vec_ids; each iteration assigns via
    broadcast centroid expressions (JVM-side) and recomputes means from
    a 16-row aggregate, ROUNDING centroids to 6 decimals so float
    summation order (partitioning, engine) cannot perturb the fit.
    Returns (centroids, assigned) where assigned = (vec_id, v, cell).
    Only O(n_cells) rows ever reach the driver.
    """
    base = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    init = base.orderBy("vec_id").limit(n_cells).collect()
    cents = [list(r.v) for r in init]
    dim = len(cents[0])
    for _ in range(n_iters):
        assigned = base.withColumn("cell", _cell_expr(F.col("v"), cents))
        aggs = assigned.groupBy("cell").agg(
            F.count("*").alias("n"),
            *[F.sum(F.col("v")[i]).alias(f"s{i}") for i in range(dim)],
        ).collect()
        for r in aggs:
            cents[r["cell"]] = [round(r[f"s{i}"] / r["n"], 6) for i in range(dim)]
    assigned = base.withColumn("cell", _cell_expr(F.col("v"), cents))
    return cents, assigned


def ivf_knn(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
) -> DataFrame:
    """IVF ANN: probe the n_probe nearest cells per query, exact cosine
    re-rank inside. One equi-join on cell — never a full cross join.
    Probe lists are computed as column expressions against the broadcast
    centroid literals, so the query side stays fully distributed."""
    cents, assigned = ivf_fit(embeddings, n_cells)
    dist_structs = F.array(
        *[
            F.struct(_sqdist_expr(F.col("qv"), c).alias("d"), F.lit(ci).alias("ci"))
            for ci, c in enumerate(cents)
        ]
    )
    probe = queries.withColumn(
        "cell",
        F.explode(
            F.transform(F.slice(F.array_sort(dist_structs), 1, n_probe), lambda s: s["ci"])
        ),
    )
    cand = probe.join(assigned, "cell").filter(F.col("query_id") != F.col("vec_id"))
    scored = cand.withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_candidate_pairs(
    embeddings: DataFrame,
    n_tables: int = NEARDUP_TABLES,
    n_planes: int = NEARDUP_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Symmetric LSH candidate pairs (vec_a < vec_b) for near-duplicate
    detection: vectors sharing any table's bucket. The distinct is on the
    ID pair only — vectors are re-joined by the caller, so the dedup
    shuffle never carries float arrays."""
    planes = _neardup_hyperplanes(dim)
    base = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    b_rows = base.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), _bucket_expr(F.col("v"), planes[t]).alias("bkt"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.tbl", "tb.bkt")
    return (
        b_rows.alias("x")
        .join(b_rows.alias("y"), ["tbl", "bkt"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )


def ann_lsh(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets (16 tables x 16
    buckets), exact cosine re-rank within the union of matching buckets.

    One shuffle on (table, bucket); candidate set is ~N/16 per table —
    at 100 TB this replaces the full scan per query. The multi-table
    dedup is on (query_id, vec_id) ONLY; vectors are re-joined after,
    so the distinct shuffle never carries the float arrays.
    """
    planes = _hyperplanes(dim)
    base = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    b_rows = base.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), _bucket_expr(F.col("v"), planes[t]).alias("bkt"))
                    for t in range(LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.tbl", "tb.bkt")
    q_rows = queries.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), _bucket_expr(F.col("qv"), planes[t]).alias("bkt"))
                    for t in range(LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("query_id", "tb.tbl", "tb.bkt")
    cand_ids = (
        q_rows.join(b_rows, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    cand = cand_ids.join(queries.select("query_id", "qv"), "query_id").join(base, "vec_id")
    scored = cand.withColumn("cosine", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
