"""JSON-OCR source (SURVEY.md §2.1 S5; reference ``graph/Graph_JsonOCR.py``):
the same node pipeline fed from JSON OCR payloads instead of PageXML-like
markup. Fully declarative — ``from_json`` with an explicit schema, then
explode pages/blocks into the standard nodes table (no Python at all,
unlike the XML path which needs a parser UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSON_DOC_SCHEMA = T.StructType(
    [
        T.StructField("pages", T.ArrayType(T.StructType(
            [
                T.StructField("w", T.DoubleType()),
                T.StructField("h", T.DoubleType()),
                T.StructField("blocks", T.ArrayType(T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("x1", T.DoubleType()),
                        T.StructField("y1", T.DoubleType()),
                        T.StructField("x2", T.DoubleType()),
                        T.StructField("y2", T.DoubleType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("label", T.StringType()),
                    ]
                ))),
            ]
        ))),
    ]
)


def parse_json_pages(pages: DataFrame, payload_col: str = "html") -> DataFrame:
    """pages with a JSON payload -> standard nodes table (url, page_num,
    page_w, page_h, page_cnt, node_id, kind, x1..y2, text, label...).

    posexplode keeps 1-based page numbering; the result is
    interchangeable with the XML parser's output, so every downstream
    stage (edges, features, extract) works unchanged."""
    doc = pages.select(
        "url",
        F.from_json(F.col(payload_col).cast("string"), JSON_DOC_SCHEMA).alias("doc"),
    )
    pg = doc.select(
        "url",
        F.size("doc.pages").alias("page_cnt"),
        F.posexplode("doc.pages").alias("p_idx", "page"),
    )
    blk = pg.select(
        "url",
        (F.col("p_idx") + 1).cast("int").alias("page_num"),
        F.col("page.w").alias("page_w"),
        F.col("page.h").alias("page_h"),
        "page_cnt",
        F.explode("page.blocks").alias("b"),
    )
    return blk.select(
        "url",
        F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("doc_id"),
        "page_num", "page_w", "page_h",
        F.col("page_cnt").cast("int").alias("page_cnt"),
        F.col("b.id").alias("node_id"),
        F.lit("TextRegion").alias("kind"),
        F.col("b.x1").alias("x1"), F.col("b.y1").alias("y1"),
        F.col("b.x2").alias("x2"), F.col("b.y2").alias("y2"),
        F.col("b.text").alias("text"),
        F.lit(0).alias("orientation"),
        F.lit(None).cast("int").alias("reading_index"),
        F.coalesce(F.col("b.label"), F.lit("other")).alias("label"),
        F.lit(None).cast("string").alias("parent_id"),
    )


def nodes_to_json_payload(nodes: DataFrame) -> DataFrame:
    """Inverse: nodes table -> one JSON payload per url (round-trip /
    export sink, reference S8-S10 family). to_json over nested structs."""
    blocks = nodes.groupBy("url", "page_num", "page_w", "page_h").agg(
        F.array_sort(
            F.collect_list(
                F.struct("node_id", "x1", "y1", "x2", "y2", "text", "label")
            )
        ).alias("bs")
    )
    pages_arr = blocks.groupBy("url").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("page_num"),
                    F.col("page_w").alias("w"),
                    F.col("page_h").alias("h"),
                    F.transform(
                        "bs",
                        lambda b: F.struct(
                            b["node_id"].alias("id"), b["x1"].alias("x1"),
                            b["y1"].alias("y1"), b["x2"].alias("x2"),
                            b["y2"].alias("y2"), b["text"].alias("text"),
                            b["label"].alias("label"),
                        ),
                    ).alias("blocks"),
                )
            )
        ).alias("ps")
    )
    return pages_arr.select(
        "url",
        F.to_json(
            F.struct(
                F.transform(
                    "ps",
                    lambda p: F.struct(
                        p["w"].alias("w"), p["h"].alias("h"), p["blocks"].alias("blocks")
                    ),
                ).alias("pages")
            )
        ).alias("payload"),
    )
