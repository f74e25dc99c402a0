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
from .parse import MAX_NODES_PER_DOC, parse_doc_cols

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


def _fused_ord_key(dc: dict, i: int):
    """Mirrors the Spark window's ASC ordering on malformed inputs too:
    NULL node_ids sort FIRST among coordinate ties (Spark default NULLS
    FIRST) and NaN coordinates sort LAST (Spark orders NaN greater than
    any double, including +Inf)."""
    import math

    y, x = dc["y1"][i], dc["x1"][i]
    nid = dc["node_id"][i]
    return (
        dc["page_num"][i],
        isinstance(y, float) and math.isnan(y), y if y == y else 0.0,
        isinstance(x, float) and math.isnan(x), x if x == x else 0.0,
        nid is not None, nid or "",
    )


def _fused_doc(
    url: str, html: bytes, cap: int | None, want: set[str] | None
) -> tuple[int, str, list[dict]] | None:
    """Per-doc body of the fused parse+extract: returns
    (doc_id, extracted_text, spans), or None when no node survives the
    label filter. Raises on unparseable/garbage input — the caller
    decides whether to skip (extract_from_pages) or report
    (extract_errors)."""
    dc = parse_doc_cols(url, html)
    n = len(dc["node_id"])
    if cap and n > cap:
        n = cap
    idx = sorted(range(n), key=lambda i: _fused_ord_key(dc, i))
    if want is not None:
        idx = [i for i in idx if dc["label"][i] in want]
    if not idx:
        return None
    parts: list[str] = []
    spans: list[dict] = []
    off = 0
    for i in idx:
        t = dc["text"][i] or ""
        parts.append(t)
        end = off + len(t)
        spans.append(
            {"node_id": dc["node_id"][i], "start": off, "end": end,
             "label": dc["label"][i]}
        )
        off = end + 1
    return dc["doc_id"][0], " ".join(parts), spans


def extract_from_pages(
    pages: DataFrame,
    labels: tuple[str, ...] | None = MAIN_CONTENT_LABELS,
    max_nodes_per_doc: int | None = MAX_NODES_PER_DOC,
) -> DataFrame:
    """Fused parse+extract: pages.html -> (url, doc_id, extracted_text,
    spans) in ONE map-only pass — the flagship 100 TB plan shape.

    Reading order, the single-space join, and span offsets are all
    DOC-LOCAL, so nothing here needs the :func:`extract_text_spans`
    window shuffle: html crosses Arrow once per doc and ONE row per doc
    comes back (node rows never cross at all). Byte-identical to
    ``extract_text_spans(parse_pages(pages), labels=...)`` — same
    canonical (page_num, y1, x1, node_id) order (ints/floats compare
    numerically; node_id tiebreak is ASCII in this corpus family, where
    Python code-point order equals Java's UTF-16 order), same
    single-space join, same running-sum offsets — and hash-verified by
    the same driver oracles. Keep :func:`extract_text_spans` for
    labeled NODE tables (predicted/smoothed labels, cluster-driven
    extraction); this fused form exists for the scan->extract path.

    ``max_nodes_per_doc``: identical semantics and default to
    ``parse_pages`` (None disables the giant-document guard)."""
    from typing import Iterator

    import pandas as pd

    cap = max_nodes_per_doc
    want = set(labels) if labels is not None else None
    schema = (
        "url string, doc_id long, extracted_text string, "
        "spans array<struct<node_id:string,start:int,end:int,label:string>>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, dids, texts, spans_col = [], [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                # One skip-on-error contract for parse AND assembly:
                # garbage rows (missing ids, NaN geometry, broken pages)
                # drop the document, never the job — same contract the
                # windowed path inherits from parse_pages. Skips are
                # auditable per-url via :func:`extract_errors`, which
                # re-runs this same per-doc body and reports the
                # exception instead of swallowing it.
                try:
                    assembled = _fused_doc(url, bytes(html), cap, want)
                except Exception:
                    continue
                if assembled is None:
                    continue
                doc_id, text, spans = assembled
                urls.append(url)
                dids.append(doc_id)
                texts.append(text)
                spans_col.append(spans)
            # A batch where EVERY doc was skipped must yield nothing:
            # pd.DataFrame({...: []}) defaults the columns to float64,
            # which Arrow cannot convert to list<struct> (found by the
            # malformed-doc probe — the job died instead of skipping).
            if urls:
                yield pd.DataFrame(
                    {"url": urls, "doc_id": dids,
                     "extracted_text": texts, "spans": spans_col}
                )

    return pages.select("url", "html").mapInPandas(run, schema=schema)


def extract_errors(
    pages: DataFrame,
    labels: tuple[str, ...] | None = MAIN_CONTENT_LABELS,
    max_nodes_per_doc: int | None = MAX_NODES_PER_DOC,
) -> DataFrame:
    """Audit channel for the fused path: one row per document that
    :func:`extract_from_pages` would SKIP because parse OR assembly
    raised (url, error). Runs the identical per-doc body, so a bug that
    silently drops documents there surfaces here with its exception —
    the fused-path analogue of :func:`parse_errors`, which only covers
    the parse step."""
    from typing import Iterator

    import pandas as pd
    import pyspark.sql.types as T

    cap = max_nodes_per_doc
    want = set(labels) if labels is not None else None
    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("error", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bad: list[dict] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    _fused_doc(url, bytes(html), cap, want)
                except Exception as e:
                    bad.append({"url": url, "error": f"{type(e).__name__}: {e}"})
            yield pd.DataFrame(bad, columns=["url", "error"])

    return pages.select("url", "html").mapInPandas(run, schema=schema)


def extract_from_clusters(nodes: DataFrame, clusters: DataFrame) -> DataFrame:
    """Cluster-driven extraction (reference C5/C12): keep nodes belonging
    to clusters, labeled by cluster majority label, then assemble text in
    reading order. clusters: (url, cluster_id, node_ids array<string>)."""
    memb = clusters.select(
        "url", "cluster_id", F.explode("node_ids").alias("node_id")
    )
    joined = nodes.join(memb, ["url", "node_id"], "inner")
    return extract_text_spans(joined, labels=None)
