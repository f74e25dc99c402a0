"""XY-cut segmentation primitives (SURVEY.md §2.8 C6; reference
``util/XYcut.py:14-67``): 1-D projection-profile interval merging with a
minimum-gap threshold, used to split a cluster's lines back into visual
rows/columns during region reconstruction.

Pure numpy — called per document inside Arrow UDF batches; also exposed
as a DataFrame operator for page-level profile segmentation (A6 shape).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_intervals(intervals: list[tuple[float, float]], min_gap: float) -> list[tuple[float, float]]:
    """Merge 1-D intervals whose gap is < ``min_gap`` (sorted sweep with
    cumulative max — the reference's iMin merging, ``util/XYcut.py:14-67``).

    Returns merged intervals sorted by start.
    """
    if not intervals:
        return []
    arr = sorted((float(a), float(b)) for a, b in intervals)
    out = [list(arr[0])]
    for a, b in arr[1:]:
        if a - out[-1][1] < min_gap:
            out[-1][1] = max(out[-1][1], b)
        else:
            out.append([a, b])
    return [(a, b) for a, b in out]


def xy_cut(boxes: np.ndarray, min_gap_x: float, min_gap_y: float,
           _depth: int = 0) -> list[list[int]]:
    """Recursive XY-cut over boxes [[x1,y1,x2,y2],...]; returns groups of
    row indices in reading order (top-to-bottom, then left-to-right).

    Alternates horizontal (y) and vertical (x) projection cuts until no
    cut exists; per-document sizes are small so recursion is bounded.
    """
    idx = np.arange(len(boxes))
    if len(boxes) <= 1 or _depth > 16:
        return [list(idx)]
    axis = 1 if _depth % 2 == 0 else 0  # y first
    lo, hi = boxes[:, axis], boxes[:, axis + 2]
    gap = min_gap_y if axis == 1 else min_gap_x
    merged = merge_intervals(list(zip(lo, hi)), gap)
    if len(merged) <= 1:
        if _depth % 2 == 0:  # try the other axis before giving up
            return xy_cut(boxes, min_gap_x, min_gap_y, _depth + 1)
        return [list(idx)]
    groups: list[list[int]] = []
    for a, b in merged:
        sel = idx[(lo >= a) & (hi <= b)]
        sub = xy_cut(boxes[sel], min_gap_x, min_gap_y, _depth + 1)
        groups.extend([list(sel[g]) for g in sub])
    return groups


def page_coverage_profile(nodes: DataFrame) -> DataFrame:
    """A6: per-page content coverage = sum(node areas) / page area
    (reference ``spm/spmPageVerticals.py:342-360``), plus corpus mean/std
    for threshold segmentation — plain aggregations."""
    per_page = (
        nodes.groupBy("url", "page_num")
        .agg(
            F.round(
                F.sum((F.col("x2") - F.col("x1")) * (F.col("y2") - F.col("y1")))
                / F.first(F.col("page_w") * F.col("page_h")),
                6,
            ).alias("coverage")
        )
    )
    return per_page
