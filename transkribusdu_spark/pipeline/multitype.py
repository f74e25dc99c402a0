"""Multitype graphs (SURVEY.md §2.4 F21, §2.9 M3): several node kinds in
one graph, per-kind feature transformers / weight blocks, and the typed
edge matrix (src_kind, dst_kind, etype) of the reference's multitype
conversion (``graph/Graph.py:474-526``).

Spark shape: kind is just a column — per-kind models are independent
fits over filtered views; typed edges are one join; nothing needs the
reference's per-type matrix bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .features import NODE_FEATURE_COLS
from .model import predict_nodes, train_node_classifier


def typed_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Edges annotated with endpoint kinds + a combined type id
    ('TextRegion>TextLine|V' style) — the 3-column typed edge matrix."""
    kinds = nodes.select("url", "node_id", "kind")
    s = kinds.select("url", F.col("node_id").alias("src"), F.col("kind").alias("src_kind"))
    d = kinds.select("url", F.col("node_id").alias("dst"), F.col("kind").alias("dst_kind"))
    return (
        edges.join(s, ["url", "src"]).join(d, ["url", "dst"])
        .withColumn(
            "etype_full",
            F.concat_ws("|", F.concat_ws(">", "src_kind", "dst_kind"), "etype"),
        )
    )


def train_multitype(node_feats: DataFrame, kinds: list[str] | None = None) -> dict:
    """One classifier per node kind (per-kind weight blocks, M3)."""
    if kinds is None:
        kinds = [r.kind for r in node_feats.select("kind").distinct().collect()]
    return {
        k: train_node_classifier(node_feats.filter(F.col("kind") == k))
        for k in sorted(kinds)
    }


def predict_multitype(models: dict, node_feats: DataFrame) -> DataFrame:
    """Apply each kind's model to its slice; union the results."""
    out = None
    for k in sorted(models):
        scored = predict_nodes(models[k], node_feats.filter(F.col("kind") == k))
        out = scored if out is None else out.unionByName(scored)
    return out


def multitype_feature_hist(node_feats: DataFrame) -> DataFrame:
    """Per-kind feature means — the per-type transformer fit surface
    (F21) as one aggregation."""
    aggs = [F.round(F.avg(c), 6).alias(f"avg_{c}") for c in NODE_FEATURE_COLS[:8]]
    return node_feats.groupBy("kind").agg(F.count("*").alias("n"), *aggs)
