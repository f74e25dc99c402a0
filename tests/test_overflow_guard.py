"""Giant-document overflow guard (SURVEY §7 risk: one pathological doc
with O(100k) nodes turns the per-doc O(n^2)-family stages — LOS sweep
candidates, dual graph — into a straggler/OOM).

Contract: parse truncates past ``max_nodes_per_doc`` keeping the HEAD
in document order, the truncation is auditable (parse_overflows) and
recorded by run_with_lineage in an ``overflows`` table — never silent,
never a crash."""

import os

import pytest
from pyspark.sql import functions as F


def _giant_doc_html(n_nodes: int) -> bytes:
    """One flat PageXML-ish page with n_nodes tiny regions in a grid."""
    parts = [b"<PcGts><Page imageWidth=\"1240\" imageHeight=\"3000\">"]
    for i in range(n_nodes):
        x = 10 + (i % 100) * 12
        y = 10 + (i // 100) * 6
        parts.append(
            (
                f'<TextRegion id="r{i:06d}">'
                f'<Coords points="{x},{y} {x+10},{y} {x+10},{y+4} {x},{y+4}"/>'
                f"<TextLine><TextEquiv><Unicode>w{i}</Unicode></TextEquiv></TextLine>"
                f"</TextRegion>"
            ).encode()
        )
    parts.append(b"</Page></PcGts>")
    return b"".join(parts)


@pytest.fixture(scope="module")
def giant_pages(spark):
    html = _giant_doc_html(50_000)
    small = _giant_doc_html(50)
    return spark.createDataFrame(
        [("https://host000.example.org/doc/000001", bytearray(html)),
         ("https://host000.example.org/doc/000002", bytearray(small))],
        "url string, html binary",
    )


def test_giant_doc_truncated_not_oom(spark, giant_pages):
    from transkribusdu_spark.pipeline.edges import build_edges
    from transkribusdu_spark.pipeline.parse import parse_overflows, parse_pages

    cap = 2_000
    nodes = parse_pages(giant_pages, max_nodes_per_doc=cap)
    counts = {r["url"]: r["n"] for r in
              nodes.groupBy("url").agg(F.count("*").alias("n")).collect()}
    assert counts["https://host000.example.org/doc/000001"] == cap
    assert counts["https://host000.example.org/doc/000002"] == 50
    # head-of-document truncation: the kept nodes are the FIRST cap ids
    kept = [r["node_id"] for r in nodes.filter(
        F.col("url").endswith("000001")).select("node_id").collect()]
    assert sorted(kept) == [f"r{i:06d}" for i in range(cap)]
    # downstream per-doc stage completes on the truncated graph
    n_edges = build_edges(nodes).count()
    assert n_edges > 0
    # the guard is auditable, and the small doc is NOT flagged
    flagged = parse_overflows(giant_pages, max_nodes_per_doc=cap).collect()
    assert len(flagged) == 1
    assert flagged[0]["url"].endswith("000001")
    assert flagged[0]["n_nodes"] == 50_000 and flagged[0]["cap"] == cap


def test_overflow_recorded_in_lineage(spark, giant_pages, tmp_path):
    from transkribusdu_spark.pipeline.extract import extract_text_spans
    from transkribusdu_spark.pipeline.lineage import run_with_lineage
    from transkribusdu_spark.pipeline.parse import parse_overflows, parse_pages

    cap = 2_000
    nodes = parse_pages(giant_pages, max_nodes_per_doc=cap)
    ext = extract_text_spans(nodes, labels=None).select("url", "extracted_text")
    out = str(tmp_path / "run")
    run_with_lineage(ext, out, run_id="r1",
                     overflows=parse_overflows(giant_pages, max_nodes_per_doc=cap))
    ov = spark.read.parquet(os.path.join(out, "overflows")).collect()
    assert len(ov) == 1
    assert ov[0]["run_id"] == "r1" and ov[0]["n_nodes"] == 50_000
    # default cap leaves ordinary corpora untouched: no overflow table
    # rows for the small doc, and lineage counts cover both docs
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    assert lin.agg(F.sum("doc_count")).collect()[0][0] == 2
