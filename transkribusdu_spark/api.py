"""Top-level composable pipelines (the reference's DU_Task entry points,
SURVEY.md §3, re-expressed as DataFrame -> DataFrame functions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline.edges import build_edges
from .pipeline.extract import extract_from_pages, extract_text_spans
from .pipeline.features import edge_features, node_features
from .pipeline.model import (
    edge_oracle_scores,
    predict_edges,
    predict_nodes,
    train_edge_classifier,
    train_node_classifier,
)
from .pipeline.parse import parse_pages
from .pipeline.segment import connected_components
from .synth import pages_from_documents


def extract_documents(pages: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """The --run path (SURVEY.md §3.2) in ground-truth-label mode:
    scan -> [repartition(url)] -> fused parse+extract (map-only, zero
    shuffle — reading order, join, and spans are doc-local).

    This is the throughput surface benchmarked in bench.py;
    byte-identical to the window-based
    ``extract_text_spans(parse_pages(pages))`` form (parity-locked).
    """
    if n_partitions:
        pages = pages.repartition(n_partitions, F.col("url"))
    return extract_from_pages(pages)


def extract_documents_predicted(pages: DataFrame, node_model) -> DataFrame:
    """Same path but labels come from the trained node classifier
    (boilerplate strip by model, not ground truth)."""
    nodes = parse_pages(pages)
    nf = node_features(nodes, build_edges(nodes))
    pred = predict_nodes(node_model, nf)
    return extract_text_spans(pred, labels=("main",), label_col="pred_label")


def conjugate_cluster(pages: DataFrame, edge_model=None) -> DataFrame:
    """Conjugate (dual) mode: score edges continue/break, cluster by
    connected components (SURVEY.md §2.8). ``edge_model=None`` uses the
    edge oracle (reference's own validation trick, M8)."""
    nodes = parse_pages(pages)
    edges = build_edges(nodes)
    ef = edge_features(edges, nodes)
    scores = edge_oracle_scores(ef) if edge_model is None else predict_edges(edge_model, ef)
    return connected_components(nodes, scores)


def extract_documents_deterministic(pages: DataFrame) -> DataFrame:
    """The hash-gateable learned path: fit the closed-form diagonal-LDA
    node classifier (bit-reproducible integer-sum fit), predict,
    Viterbi-smooth with fitted transitions, extract. This is the
    pipeline the contract query `extract_predicted_smoothed` verifies
    against the independent single-node oracle."""
    from .pipeline.model import (
        fit_label_transitions,
        fit_lda_params,
        predict_nodes_lda,
        viterbi_smooth,
    )

    nodes = parse_pages(pages)
    params = fit_lda_params(nodes)
    pred = predict_nodes_lda(nodes, params)
    sm = viterbi_smooth(pred, log_trans=fit_label_transitions(nodes))
    labeled = pred.drop("y_proba").join(sm, ["url", "node_id"])
    return extract_text_spans(labeled, labels=("main",), label_col="smoothed_label")


def segment_regions(pages: DataFrame, edge_model=None, min_col_gap: float = 30.0) -> DataFrame:
    """Full segmentation surface: conjugate clustering, column splitting
    via the linear separator (C7), convex hulls per refined cluster
    (C4) — the cluster->DOM geometry the exporter consumes."""
    from .pipeline.segment import clusters_with_hulls, split_wide_clusters

    nodes = parse_pages(pages)
    edges = build_edges(nodes)
    ef = edge_features(edges, nodes)
    scores = edge_oracle_scores(ef) if edge_model is None else predict_edges(edge_model, ef)
    clusters = connected_components(nodes, scores)
    refined = split_wide_clusters(clusters, nodes, min_gap=min_col_gap)
    return clusters_with_hulls(refined.drop("separator"), nodes)


def train_models(pages: DataFrame):
    """Fit stage: returns (node_model, edge_model) trained on GT labels."""
    nodes = parse_pages(pages)
    edges = build_edges(nodes)
    nf = node_features(nodes, edges)
    ef = edge_features(edges, nodes)
    return train_node_classifier(nf), train_edge_classifier(ef)


def pages_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pages_from_documents(spark, sf_dir)
