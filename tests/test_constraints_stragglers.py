"""ATMOSTONE constraint + lineage straggler stats."""

from pyspark.sql import functions as F

from transkribusdu_spark.pipeline.extract import extract_text_spans
from transkribusdu_spark.pipeline.lineage import run_with_lineage, straggler_stats
from transkribusdu_spark.pipeline.model import apply_atmostone
from transkribusdu_spark.pipeline.parse import parse_pages
from transkribusdu_spark.synth import pages_from_documents


def test_atmostone_keeps_best(spark):
    rows = [
        ("u", 1, "a", "page-number", 0.9),
        ("u", 1, "b", "page-number", 0.8),
        ("u", 1, "c", "paragraph", 0.7),
        ("u", 2, "d", "page-number", 0.6),
    ]
    df = spark.createDataFrame(
        rows, "url string, page_num int, node_id string, pred_label string, p double"
    )
    out = {r.node_id: r.pred_label for r in apply_atmostone(
        df, "page-number", "p").collect()}
    assert out == {"a": "page-number", "b": "other", "c": "paragraph", "d": "page-number"}


def test_straggler_stats_on_balanced_run(spark, sf_dir, tmp_path):
    out_dir = str(tmp_path / "sout")
    pages = pages_from_documents(spark, sf_dir).repartition(8, F.col("url"))
    run_with_lineage(extract_text_spans(parse_pages(pages)), out_dir, run_id="s1")
    stats = straggler_stats(spark, out_dir)
    assert stats["partitions"] >= 1
    assert stats["max_ms"] >= stats["median_ms"] >= 0
    # balanced synthetic input on url-hash partitioning: no 10x stragglers
    if stats["partitions"] >= 4 and stats["median_ms"] > 50:
        assert stats["ratio"] < 6, stats
