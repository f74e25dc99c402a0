"""Multitype graphs: TextRegion + TextLine node kinds in one pipeline."""

from pyspark.sql import functions as F

from transkribusdu_spark.pipeline.edges import build_edges
from transkribusdu_spark.pipeline.features import node_features
from transkribusdu_spark.pipeline.multitype import (
    multitype_feature_hist,
    predict_multitype,
    train_multitype,
    typed_edges,
)
from transkribusdu_spark.pipeline.parse import parse_pages
from transkribusdu_spark.synth import pages_from_documents


def test_parse_both_kinds(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir).limit(30).cache()
    both = parse_pages(pages, kinds=("TextRegion", "TextLine"))
    counts = {r.kind: r.n for r in both.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert counts["TextLine"] >= counts["TextRegion"] > 0
    # region text equals space-join of its line texts (nesting invariant)
    regions = both.filter(F.col("kind") == "TextRegion").select(
        "url", F.col("node_id").alias("rid"), F.col("text").alias("rtext")
    )
    lines = both.filter(F.col("kind") == "TextLine").withColumn(
        "rid", F.regexp_replace("node_id", r"_l\d+$", "")
    )
    joined = (
        lines.groupBy("url", "rid")
        .agg(F.array_join(F.transform(F.array_sort(F.collect_list(
            F.struct("reading_index", "text"))), lambda s: s["text"]), " ").alias("ltext"))
        .join(regions, ["url", "rid"])
    )
    bad = joined.filter(F.col("ltext") != F.col("rtext")).count()
    assert bad == 0


def test_typed_edges_and_multitype_models(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir).limit(40).cache()
    nodes = parse_pages(pages, kinds=("TextRegion", "TextLine"))
    edges = build_edges(nodes)
    te = typed_edges(edges, nodes)
    kinds_seen = {r.etype_full.split("|")[0] for r in te.select("etype_full").distinct().collect()}
    assert any(">" in k for k in kinds_seen)
    nf = node_features(nodes).cache()
    models = train_multitype(nf)
    assert set(models) == {"TextLine", "TextRegion"}
    pred = predict_multitype(models, nf)
    assert pred.count() == nf.count()
    hist = multitype_feature_hist(nf)
    assert hist.count() == 2
