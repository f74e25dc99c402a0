"""Table row detection + BIESO tagging (SURVEY.md §2.8 C9, lite).

The reference's ABP table task labels TextLines with row-position tags
``RB RI RE RS RO`` (row Begin / Inner / End / Single / Outside,
``tasks/DU_Table/DU_ABPTable.py:61``) and detects rows from cut
candidates (``tasks/DU_Table/rowDetection.py``). Re-expressed here:

1. group a page's line nodes into visual rows by 1-D interval merging of
   their y-extents (the projection-profile cut, functions/xycut.py);
2. order each row left-to-right and tag positions BIESO.

Per-document ``applyInPandas`` over the standard nodes table — works on
any node kind that has boxes (TextLine nodes from the multitype parser).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.xycut import merge_intervals

ROW_TAGS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("node_id", T.StringType(), False),
        T.StructField("row_id", T.IntegerType(), False),
        T.StructField("col_pos", T.IntegerType(), False),
        T.StructField("bieso", T.StringType(), False),
    ]
)


def tag_doc_rows(pdf: pd.DataFrame, min_gap: float = 10.0) -> pd.DataFrame:
    """One document: line boxes -> (row_id, col_pos, BIESO tag)."""
    out = {k: [] for k in ("url", "node_id", "row_id", "col_pos", "bieso")}
    url = pdf["url"].iloc[0] if len(pdf) else None
    row_counter = 0
    for _, page in pdf.groupby("page_num", sort=True):
        ys = list(zip(page["y1"], page["y2"]))
        bands = merge_intervals(ys, min_gap)
        # assign each line to the band containing its y-center
        centers = (page["y1"] + page["y2"]) / 2.0
        for lo, hi in bands:
            sel = page[(centers >= lo) & (centers <= hi)].sort_values(
                ["x1", "node_id"]
            )
            n = len(sel)
            for pos, r in enumerate(sel.itertuples()):
                if n == 1:
                    tag = "RS"
                elif pos == 0:
                    tag = "RB"
                elif pos == n - 1:
                    tag = "RE"
                else:
                    tag = "RI"
                out["url"].append(url)
                out["node_id"].append(r.node_id)
                out["row_id"].append(row_counter)
                out["col_pos"].append(pos)
                out["bieso"].append(tag)
            row_counter += 1
    return pd.DataFrame(out)


def bieso_tag_rows(nodes: DataFrame, min_gap: float = 10.0,
                   kind: str | None = "TextLine") -> DataFrame:
    """nodes -> BIESO row tags; one co-partitioned groupBy on url."""
    src = nodes
    if kind is not None:
        src = src.filter(F.col("kind") == kind)
    src = src.select("url", "node_id", "page_num", "x1", "y1", "x2", "y2")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return tag_doc_rows(pdf, min_gap)

    return src.groupBy("url").applyInPandas(run, schema=ROW_TAGS_SCHEMA)


def row_eval(tags: DataFrame, gt: DataFrame) -> DataFrame:
    """E5-style row evaluation: per-url fraction of nodes whose BIESO tag
    matches ground truth (gt: url, node_id, bieso)."""
    j = tags.join(
        gt.select("url", "node_id", F.col("bieso").alias("gt_bieso")),
        ["url", "node_id"],
    )
    return j.groupBy("url").agg(
        F.round(F.avg((F.col("bieso") == F.col("gt_bieso")).cast("double")), 6).alias("tag_acc")
    )
