"""Learned (model-predicted) extraction quality: with cross-document
host-repetition features the node classifier should reproduce the GT
extraction nearly perfectly — the Spark-native boilerplate signal the
single-process reference cannot compute (README 'beyond the reference')."""

from pyspark.sql import functions as F

from transkribusdu_spark.pipeline.edges import build_edges
from transkribusdu_spark.pipeline.extract import extract_text_spans
from transkribusdu_spark.pipeline.features import node_features
from transkribusdu_spark.pipeline.model import predict_nodes, train_node_classifier
from transkribusdu_spark.pipeline.parse import parse_pages
from transkribusdu_spark.synth import pages_from_documents


def test_predicted_extraction_nearly_byte_identical(spark, sf_dir):
    nodes = parse_pages(pages_from_documents(spark, sf_dir))
    nf = node_features(nodes, build_edges(nodes)).cache()
    model = train_node_classifier(nf)
    pred = predict_nodes(model, nf)
    ext = extract_text_spans(pred, labels=("main",), label_col="pred_label")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    j = ext.join(docs, "doc_id")
    n = j.count()
    ok = j.filter(F.col("extracted_text") == F.col("text")).count()
    assert ok / n >= 0.9, f"learned extraction only {ok}/{n} byte-identical"


def test_host_repetition_feature_separates_boilerplate(spark, sf_dir):
    nodes = parse_pages(pages_from_documents(spark, sf_dir))
    nf = node_features(nodes)
    stats = (
        nf.withColumn("is_boiler", ~F.col("label").isin("paragraph", "heading"))
        .groupBy("is_boiler")
        .agg(F.avg("nf_host_rep_frac").alias("avg_rep"))
        .collect()
    )
    d = {r.is_boiler: r.avg_rep for r in stats}
    assert d[True] > d[False] * 3, d
