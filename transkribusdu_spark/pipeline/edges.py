"""Edge building: per-document spatial line-of-sight self-joins.

Reference semantics (SURVEY.md §2.3): vertical/horizontal neighbour
edges via a sweep with visibility masking (``graph/Block.py:350-371,
456-688``), cross-page overlap edges on IoU >= 0.25
(``graph/Block.py:374-432``), projection-overlap IoU on each edge
(``graph/Edge.py:132-175``), coordinates grid-rounded to multiples of 2
before sweeping (``graph/Block.py:37,443-445``).

Spark shape: documents never share edges, so this is ``applyInPandas``
over ``nodes.groupBy("url")`` — one shuffle on the url key, then pure
numpy per document. At cluster scale the shuffle is hash-partitioned and
AQE splits skewed documents' partitions; the per-document kernel is the
same sorted sweep the reference uses, so cost is ~O(N log N + E) per
page, never O(N^2) in the common (sparse-visibility) case.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..schemas import EDGES_SCHEMA

GRID = 2
CROSS_PAGE_IOU = 0.25


def _g(v: float) -> float:
    """Grid rounding (multiples of GRID), reference ``Block.setThickBox``
    style: collapses float keys so sweep bands are stable."""
    return round(v / GRID) * GRID


def _subtract_seen(lo: float, hi: float, seen: list[tuple[float, float]]) -> float:
    """Length of [lo,hi] not covered by the union of ``seen`` intervals
    (the visibility mask, reference ``util/masking.py:57-94``)."""
    if hi <= lo:
        return 0.0
    segs = [(lo, hi)]
    for s_lo, s_hi in seen:
        nxt = []
        for a, b in segs:
            if s_hi <= a or s_lo >= b:
                nxt.append((a, b))
            else:
                if a < s_lo:
                    nxt.append((a, s_lo))
                if s_hi < b:
                    nxt.append((s_hi, b))
        segs = nxt
        if not segs:
            return 0.0
    return float(sum(b - a for a, b in segs))


def _merge_into(seen: list[tuple[float, float]], lo: float, hi: float) -> None:
    seen.append((lo, hi))


def _covered(lo: float, hi: float, seen: list[tuple[float, float]]) -> bool:
    return _subtract_seen(lo, hi, seen) <= 0.0


def _los_pass(
    ids: np.ndarray,
    a1: np.ndarray,
    a2: np.ndarray,
    b1: np.ndarray,
    b2: np.ndarray,
) -> Iterable[tuple[int, int, float, float, float]]:
    """One directional line-of-sight pass.

    (a1,a2) = interval along the *overlap* axis; (b1,b2) = interval along
    the *sweep* axis. Emits (i, j, length, overlap, iou) for each pair
    where j is visible strictly below i along the sweep axis. Vertical
    edges: overlap axis = x, sweep axis = y. Horizontal edges are the
    same pass with axes swapped (reference rotates -90 deg and reuses the
    vertical code, ``graph/Block.py:350-371``).
    """
    n = len(ids)
    if n < 2:
        return
    ga1 = np.array([_g(v) for v in a1])
    ga2 = np.array([_g(v) for v in a2])
    gb1 = np.array([_g(v) for v in b1])
    gb2 = np.array([_g(v) for v in b2])
    # Sweep order: by start of sweep axis, then overlap axis (determinism).
    order = np.lexsort((ga1, gb1))
    for ii in range(n):
        i = int(order[ii])
        seen: list[tuple[float, float]] = []
        for jj in range(n):
            j = int(order[jj])
            if j == i or gb1[j] < gb2[i]:
                # only blocks starting at/after the bottom of i (mode g1:
                # non-overlapping layout assumption, graph/Block.py:506)
                continue
            lo = max(ga1[i], ga1[j])
            hi = min(ga2[i], ga2[j])
            if hi <= lo:
                continue
            visible = _subtract_seen(lo, hi, seen)
            if visible > 0.0:
                len_i = ga2[i] - ga1[i]
                len_j = ga2[j] - ga1[j]
                ov = hi - lo
                iou = ov / (len_i + len_j - ov) if (len_i + len_j - ov) > 0 else 0.0
                length = float(gb1[j] - gb2[i])
                yield i, j, max(length, 0.0), float(ov), float(iou)
            _merge_into(seen, lo, hi)
            if _covered(ga1[i], ga2[i], seen):
                break  # watermark early-exit (graph/Block.py:562-565)


def _box_iou(x1a, y1a, x2a, y2a, x1b, y1b, x2b, y2b) -> float:
    ox = max(0.0, min(x2a, x2b) - max(x1a, x1b))
    oy = max(0.0, min(y2a, y2b) - max(y1a, y1b))
    inter = ox * oy
    if inter <= 0:
        return 0.0
    ua = (x2a - x1a) * (y2a - y1a) + (x2b - x1b) * (y2b - y1b) - inter
    return inter / ua if ua > 0 else 0.0


def doc_edges(pdf: pd.DataFrame) -> pd.DataFrame:
    """All edges for one document's nodes (pure pandas/numpy; unit-testable)."""
    out: list[dict] = []
    url = pdf["url"].iloc[0] if len(pdf) else None
    for pnum, page in pdf.groupby("page_num", sort=True):
        ids = page["node_id"].to_numpy()
        x1 = page["x1"].to_numpy(dtype=np.float64)
        y1 = page["y1"].to_numpy(dtype=np.float64)
        x2 = page["x2"].to_numpy(dtype=np.float64)
        y2 = page["y2"].to_numpy(dtype=np.float64)
        # Vertical: overlap on x, sweep on y.
        for i, j, length, ov, iou in _los_pass(ids, x1, x2, y1, y2):
            out.append(
                dict(url=url, page_num=int(pnum), src=ids[i], dst=ids[j],
                     etype="V", length=length, overlap=ov, iou=iou)
            )
        # Horizontal: overlap on y, sweep on x.
        for i, j, length, ov, iou in _los_pass(ids, y1, y2, x1, x2):
            out.append(
                dict(url=url, page_num=int(pnum), src=ids[i], dst=ids[j],
                     etype="H", length=length, overlap=ov, iou=iou)
            )
    # Cross-page: consecutive pages, box IoU >= threshold
    # (significantOverlap, graph/Block.py:212-278; N is small per page).
    pages = {int(p): g for p, g in pdf.groupby("page_num", sort=True)}
    for pnum in sorted(pages):
        if pnum + 1 not in pages:
            continue
        a, b = pages[pnum], pages[pnum + 1]
        for _, ra in a.iterrows():
            for _, rb in b.iterrows():
                iou = _box_iou(ra.x1, ra.y1, ra.x2, ra.y2, rb.x1, rb.y1, rb.x2, rb.y2)
                if iou >= CROSS_PAGE_IOU:
                    out.append(
                        dict(url=url, page_num=int(pnum), src=ra.node_id, dst=rb.node_id,
                             etype="CP", length=0.0, overlap=0.0, iou=float(iou))
                    )
    cols = [f.name for f in EDGES_SCHEMA.fields]
    return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


def build_edges(nodes: DataFrame, short_only: bool = False) -> DataFrame:
    """nodes -> edges: one shuffle on url, then per-doc numpy kernels.

    ``short_only`` filters V/H edges longer than the source block height
    (reference ``bShortOnly`` pruning, ``graph/Block.py:551-556``) —
    a cheap way to cap edge count on dense documents at scale.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        edges = doc_edges(pdf)
        if short_only and len(edges):
            heights = dict(zip(pdf["node_id"], (pdf["y2"] - pdf["y1"])))
            keep = [
                (r.etype == "CP") or (r.length < heights.get(r.src, np.inf))
                for r in edges.itertuples()
            ]
            edges = edges[keep]
        return edges

    return nodes.groupBy("url").applyInPandas(run, schema=EDGES_SCHEMA)
