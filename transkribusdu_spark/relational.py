"""Relational operator coverage: the aggregation / join / window / sort
/ set-op shapes of SURVEY.md §2.5-2.7 expressed over the driver-provided
star schema, plus classic pricing-summary / revenue joins that exercise
partial aggregation, broadcast joins and top-k.

Plan hygiene (checked in tests via .explain): filters reach the parquet
scan (PushedFilters), small dims are broadcast, aggregations are
partial+final (map-side combine), every float output is rounded at the
boundary so cross-engine comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- A1: label histogram / coverage check ---------------------------------
def label_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang")
    )


# --- A2: balanced class weights (graph/GraphModel.py:468-500) --------------
def class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("c"))
    tot = docs.count()
    k = counts.count()
    w = counts.withColumn("w_raw", F.lit(tot) / (F.lit(k) * F.col("c")))
    s = w.agg(F.sum("w_raw")).collect()[0][0]
    return w.select(
        "lang", F.round(F.col("w_raw") * F.lit(k) / F.lit(s), 6).alias("weight")
    ).orderBy("lang")


# --- A5: quantile fit (exact, interpolated) --------------------------------
def n_chars_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.round(F.percentile("n_chars", F.lit(0.25)), 6).alias("q25"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("q50"),
        F.round(F.percentile("n_chars", F.lit(0.75)), 6).alias("q75"),
    )


# --- A4/O5: deterministic top-K vocabulary fit ------------------------------
def token_df_topk(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("token"))  # deterministic tie-break
        .limit(k)
    )


# --- A7: confusion-matrix-shaped two-key aggregation ------------------------
def lang_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n"))
    )


# --- Pricing summary (partial-agg heavy, TPC-H Q1 shape) --------------------
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Revenue by nation: multi-join with broadcast dims ----------------------
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)  # tiny dim: broadcast
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )
    return rev


# --- Top-k with deterministic ordering (Q3 shape) ---------------------------
def top_orders_by_revenue(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
    )


# --- Window function: top-N events per user ---------------------------------
def first_events_per_user(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= n)
        .select("user_id", "event_id", "event_type", "rn")
    )


# --- Set ops: per-user event-type overlap (U5 jaccard shape) -----------------
def user_event_type_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard of event-type sets between consecutive user ids (array
    intersect/union — the reference's util/jaccard.py:19-44 on sets)."""
    ev = _t(spark, sf_dir, "events")
    sets = ev.groupBy("user_id").agg(F.collect_set("event_type").alias("s"))
    a = sets.select(F.col("user_id").alias("u"), F.col("s").alias("sa"))
    b = sets.select((F.col("user_id") - 1).alias("u"), F.col("s").alias("sb"))
    return (
        a.join(b, "u")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn("un", F.size(F.array_union("sa", "sb")))
        .select(
            F.col("u").alias("user_id"),
            F.round(F.col("inter") / F.col("un"), 6).alias("jaccard_next_user"),
        )
    )
