"""Write-back render round-trip, DTW alignment, CV folds/grid search."""

import numpy as np
from pyspark.sql import functions as F

from transkribusdu_spark.functions.dtw import align_partitions, dtw_distance
from transkribusdu_spark.pipeline.cv import (
    assign_folds,
    check_fold_disjointness,
    split_train_test,
)
from transkribusdu_spark.pipeline.parse import parse_pages
from transkribusdu_spark.sources.writeback import render_enriched_xml
from transkribusdu_spark.synth import pages_from_documents


def test_render_roundtrip_through_parser(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir).limit(30)
    nodes = parse_pages(pages)
    rendered = render_enriched_xml(nodes).select(
        "url", F.encode("xml", "UTF-8").alias("html")
    )
    re_nodes = parse_pages(rendered)
    a = sorted(map(tuple, nodes.select("url", "node_id", "text", "label").collect()))
    b = sorted(map(tuple, re_nodes.select("url", "node_id", "text", "label").collect()))
    assert a == b


def test_dtw_identity_and_shift():
    c = np.array([[0.0, 1.0], [1.0, 0.0]])
    dist, path = dtw_distance(c)
    assert dist == 0.0 and path == [(0, 0), (1, 1)]
    # perfect partition alignment
    assert align_partitions([{1, 2}, {3}], [{1, 2}, {3}]) == 1.0
    # half overlap
    s = align_partitions([{1, 2}], [{1}])
    assert 0.4 < s < 0.6


def test_folds_disjoint_and_stable(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir)
    f1 = assign_folds(pages, n_folds=4)
    f2 = assign_folds(pages, n_folds=4)
    assert check_fold_disjointness(f1)
    assert sorted(map(tuple, f1.collect())) == sorted(map(tuple, f2.collect()))
    counts = f1.groupBy("fold").count().collect()
    assert len(counts) == 4
    tr, te = split_train_test(pages, f1, test_fold=0)
    assert tr.count() + te.count() == pages.count()
    assert tr.select("url").intersect(te.select("url")).count() == 0


def test_grid_search_small(spark, sf_dir):
    from transkribusdu_spark.pipeline.cv import grid_search_node_classifier
    from transkribusdu_spark.pipeline.features import node_features

    nodes = parse_pages(pages_from_documents(spark, sf_dir).limit(60))
    nf = node_features(nodes).cache()
    model, metrics = grid_search_node_classifier(nf)
    assert len(metrics) == 4
    assert all(0.0 <= m <= 1.0 for m in metrics.values())
    assert model.numFeatures > 0


def test_writeback_rebuilds_true_line_tree(spark, sf_dir):
    """S10 full: rendering with the multitype line table must nest each
    region's ORIGINAL lines (ids, boxes, texts), and the round-trip must
    reproduce both the region extraction and the line node set."""
    from pyspark.sql import functions as F

    from transkribusdu_spark.pipeline.extract import extract_text_spans
    from transkribusdu_spark.pipeline.parse import parse_pages
    from transkribusdu_spark.sources.writeback import render_enriched_xml
    from transkribusdu_spark.synth import pages_from_documents

    pages = pages_from_documents(spark, sf_dir).limit(40)
    both = parse_pages(pages, kinds=("TextRegion", "TextLine")).cache()
    regions = both.filter(F.col("kind") == "TextRegion")
    lines = both.filter(F.col("kind") == "TextLine")
    rendered = render_enriched_xml(regions, lines=both).select(
        "url", F.encode("xml", "UTF-8").alias("html")
    )
    # region-level round trip: extraction identical to the original
    re_regions = parse_pages(rendered)
    a = extract_text_spans(regions).select("url", "extracted_text")
    b = extract_text_spans(re_regions).select("url", F.col("extracted_text").alias("rt"))
    diff = a.join(b, "url").filter(F.col("extracted_text") != F.col("rt")).count()
    assert diff == 0
    # line-level round trip: the ORIGINAL line ids/texts come back
    re_lines = parse_pages(rendered, kinds=("TextLine",))
    orig = {(r.url, r.node_id, r.text) for r in lines.select("url", "node_id", "text").collect()}
    back = {(r.url, r.node_id, r.text) for r in re_lines.select("url", "node_id", "text").collect()}
    assert orig == back
