"""Extraction stage: labeled nodes -> per-document text + span offsets.

This is the byte-identical surface (reference reading-order assembly:
sort by (page, y, x) ``graph/Block.py:309-318`` +
``spm/spmPageVerticals.py:374-376``; text join ``graph/Graph_DOM.py:166-195``).

Spark-first: the whole stage is a window function + groupBy — no Python
UDF at all. Span offsets are a running sum over the canonical order
(start_i = sum_{j<i}(len_j + 1) for the single-space join), so the stage
stays inside whole-stage codegen and scales as an ordinary shuffle-once
aggregation keyed on url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import MAIN_CONTENT_LABELS

# Canonical reading order (SURVEY.md §2.6 O2): page, then top-to-bottom,
# then left-to-right; node_id as the deterministic tiebreak.
READING_ORDER = ["page_num", "y1", "x1", "node_id"]


def extract_text_spans(
    nodes: DataFrame,
    labels: tuple[str, ...] | None = MAIN_CONTENT_LABELS,
    label_col: str = "label",
) -> DataFrame:
    """nodes -> (url, doc_id, extracted_text, spans).

    ``labels=None`` extracts everything (full-text mode); the default
    keeps main-content labels only (boilerplate strip).
    """
    sel = nodes
    if labels is not None:
        sel = sel.filter(F.col(label_col).isin(list(labels)))

    w = Window.partitionBy("url").orderBy(*[F.col(c) for c in READING_ORDER])
    cum = Window.partitionBy("url").orderBy(*[F.col(c) for c in READING_ORDER]).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sel = (
        sel.withColumn("rn", F.row_number().over(w))
        .withColumn("tlen", F.length(F.coalesce(F.col("text"), F.lit(""))))
        # running sum of (len + 1 separator) up to and including this row;
        # subtracting (len+1) gives this row's start offset.
        .withColumn("cum", F.sum(F.col("tlen") + F.lit(1)).over(cum))
        .withColumn("start", (F.col("cum") - F.col("tlen") - F.lit(1)).cast("int"))
        .withColumn("end", (F.col("cum") - F.lit(1)).cast("int"))
    )
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("rn"),
                F.col("text"),
                F.col("node_id"),
                F.col("start"),
                F.col("end"),
                F.col(label_col).alias("label"),
            )
        )
    )
    return (
        sel.groupBy("url")
        .agg(F.first("doc_id").alias("doc_id"), ordered.alias("parts"))
        .select(
            "url",
            "doc_id",
            F.array_join(F.transform("parts", lambda p: p["text"]), " ").alias("extracted_text"),
            F.transform(
                "parts",
                lambda p: F.struct(
                    p["node_id"].alias("node_id"),
                    p["start"].alias("start"),
                    p["end"].alias("end"),
                    p["label"].alias("label"),
                ),
            ).alias("spans"),
        )
    )


def extract_from_clusters(nodes: DataFrame, clusters: DataFrame) -> DataFrame:
    """Cluster-driven extraction (reference C5/C12): keep nodes belonging
    to clusters, labeled by cluster majority label, then assemble text in
    reading order. clusters: (url, cluster_id, node_ids array<string>)."""
    memb = clusters.select(
        "url", "cluster_id", F.explode("node_ids").alias("node_id")
    )
    joined = nodes.join(memb, ["url", "node_id"], "inner")
    return extract_text_spans(joined, labels=None)
