"""Evaluation operators (SURVEY.md §2.10 E1-E4), fully declarative.

The reference accumulates per-document confusion matrices and cluster
metrics in Python (``common/TestReport.py:97-366``,
``util/metrics.py``); here every metric is a DataFrame aggregation so it
scales to any corpus: confusion matrix = groupBy(label, pred),
P/R/F from the matrix, Adjusted Rand Index from contingency counts
(pair-counting form — no per-doc Python, no Hungarian needed for ARI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(scored: DataFrame, label_col: str = "label",
                     pred_col: str = "pred_label") -> DataFrame:
    """E1/A7: global confusion matrix as (label, pred, n)."""
    return (
        scored.groupBy(F.col(label_col).alias("label"), F.col(pred_col).alias("pred"))
        .agg(F.count("*").alias("n"))
    )


def precision_recall_f1(conf: DataFrame) -> DataFrame:
    """Per-class precision/recall/F1/support from a confusion matrix."""
    tp = conf.filter(F.col("label") == F.col("pred")).select(
        F.col("label").alias("cls"), F.col("n").alias("tp")
    )
    support = conf.groupBy("label").agg(F.sum("n").alias("support")).withColumnRenamed("label", "cls")
    predicted = conf.groupBy("pred").agg(F.sum("n").alias("predicted")).withColumnRenamed("pred", "cls")
    out = (
        support.join(predicted, "cls", "outer")
        .join(tp, "cls", "left")
        .fillna({"tp": 0, "support": 0, "predicted": 0})
        .withColumn("precision", F.round(F.when(F.col("predicted") > 0, F.col("tp") / F.col("predicted")).otherwise(0.0), 6))
        .withColumn("recall", F.round(F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(0.0), 6))
    )
    return out.withColumn(
        "f1",
        F.round(
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0),
            6,
        ),
    ).select("cls", "support", "predicted", "tp", "precision", "recall", "f1")


def _comb2(c):
    return c * (c - F.lit(1)) / F.lit(2.0)


def adjusted_rand_index(gt: DataFrame, pred: DataFrame) -> DataFrame:
    """E4: per-document Adjusted Rand Index between two clusterings.

    gt / pred: (url, node_id, cluster_id). Pair-counting form over the
    contingency table — three aggregations, no per-doc Python
    (reference: ``util/metrics.py:291-314``, in-memory)."""
    g = gt.select("url", "node_id", F.col("cluster_id").alias("gc"))
    p = pred.select("url", "node_id", F.col("cluster_id").alias("pc"))
    j = g.join(p, ["url", "node_id"])
    nij = j.groupBy("url", "gc", "pc").agg(F.count("*").alias("n"))
    sum_ij = nij.groupBy("url").agg(F.sum(_comb2(F.col("n"))).alias("s_ij"))
    ai = nij.groupBy("url", "gc").agg(F.sum("n").alias("a")).groupBy("url").agg(
        F.sum(_comb2(F.col("a"))).alias("s_a")
    )
    bj = nij.groupBy("url", "pc").agg(F.sum("n").alias("b")).groupBy("url").agg(
        F.sum(_comb2(F.col("b"))).alias("s_b")
    )
    tot = j.groupBy("url").agg(_comb2(F.count("*")).alias("s_n"))
    out = (
        sum_ij.join(ai, "url").join(bj, "url").join(tot, "url")
        .withColumn("expected", F.col("s_a") * F.col("s_b") / F.col("s_n"))
        .withColumn("max_idx", (F.col("s_a") + F.col("s_b")) / 2.0)
        .withColumn(
            "ari",
            F.round(
                F.when(
                    (F.col("max_idx") - F.col("expected")) != 0,
                    (F.col("s_ij") - F.col("expected")) / (F.col("max_idx") - F.col("expected")),
                ).otherwise(1.0),
                6,
            ),
        )
    )
    return out.select("url", "ari")


def cluster_pairs_jaccard(gt: DataFrame, pred: DataFrame, threshold: float = 0.5) -> DataFrame:
    """E2-style partition evaluation: match predicted clusters to GT
    clusters when member-set Jaccard >= threshold; emit per-url
    ok/err/miss counts (reference ``util/partitionEvaluation.py:28-77``)."""
    g = gt.groupBy("url", "cluster_id").agg(F.collect_set("node_id").alias("gm"))
    p = pred.groupBy("url", "cluster_id").agg(F.collect_set("node_id").alias("pm"))
    j = (
        g.alias("g").join(p.alias("p"), "url")
        .withColumn("inter", F.size(F.array_intersect("gm", "pm")))
        .withColumn("union", F.size(F.array_union("gm", "pm")))
        .withColumn("jac", F.col("inter") / F.col("union"))
        .filter(F.col("jac") >= threshold)
        .groupBy("url")
        .agg(F.count("*").alias("ok"))
    )
    ng = g.groupBy("url").agg(F.count("*").alias("n_gt"))
    np_ = p.groupBy("url").agg(F.count("*").alias("n_pred"))
    return (
        ng.join(np_, "url", "outer").join(j, "url", "left").fillna({"ok": 0})
        .withColumn("miss", F.col("n_gt") - F.col("ok"))
        .withColumn("err", F.col("n_pred") - F.col("ok"))
        .select("url", "ok", "err", "miss", "n_gt", "n_pred")
    )
