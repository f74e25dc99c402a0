"""Top-level composable pipelines (the reference's DU_Task entry points,
SURVEY.md §3, re-expressed as DataFrame -> DataFrame functions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline.edges import build_edges
from .pipeline.extract import extract_text_spans
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
    scan -> repartition(url) -> parse -> extract main-content text+spans.

    Map-only after the single explicit repartition; this is the
    throughput surface benchmarked in bench.py.
    """
    if n_partitions:
        pages = pages.repartition(n_partitions, F.col("url"))
    nodes = parse_pages(pages)
    return extract_text_spans(nodes)


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


def train_models(pages: DataFrame):
    """Fit stage: returns (node_model, edge_model) trained on GT labels."""
    nodes = parse_pages(pages)
    edges = build_edges(nodes)
    nf = node_features(nodes, edges)
    ef = edge_features(edges, nodes)
    return train_node_classifier(nf), train_edge_classifier(ef)


def pages_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pages_from_documents(spark, sf_dir)
