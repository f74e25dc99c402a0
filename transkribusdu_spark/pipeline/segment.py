"""Segmentation: edge continue/break probabilities -> node clusters.

Reference semantics (SURVEY.md §2.8): connected components over edges
with P(continue) >= threshold (C2,
``GraphBinaryConjugateSegmenter.py:99-136``) and agglomerative merging
seeded by CC@0.99 (C3, ``:139-279``). The reference uses a dense N x N
adjacency + recursive DFS (an O(N^2)-memory anti-pattern, SURVEY.md §4);
we use union-find over the edge list — O(E α(N)) — inside
``applyInPandas`` per document. Documents never share edges
(``graph/Graph_Multi_SinglePageXml.py:77-133``), so no cross-document
iteration (GraphFrames-style) is ever needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CLUSTERS_SCHEMA


class _UF:
    __slots__ = ("p", "r")

    def __init__(self, n: int):
        self.p = list(range(n))
        self.r = [0] * n

    def find(self, x: int) -> int:
        p = self.p
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.r[ra] < self.r[rb]:
            ra, rb = rb, ra
        self.p[rb] = ra
        if self.r[ra] == self.r[rb]:
            self.r[ra] += 1


def cluster_doc(node_ids: list[str], edges: pd.DataFrame, threshold: float) -> list[list[str]]:
    """Union-find connected components for one document (unit-testable)."""
    idx = {nid: i for i, nid in enumerate(node_ids)}
    uf = _UF(len(node_ids))
    if len(edges):
        keep = edges[edges["p_continue"] >= threshold]
        for src, dst in zip(keep["src"], keep["dst"]):
            if src in idx and dst in idx:
                uf.union(idx[src], idx[dst])
    groups: dict[int, list[str]] = {}
    for nid, i in idx.items():
        groups.setdefault(uf.find(i), []).append(nid)
    # deterministic: clusters ordered by smallest member id, members sorted
    out = [sorted(g) for g in groups.values()]
    out.sort(key=lambda g: g[0])
    return out


def connected_components(nodes: DataFrame, edge_scores: DataFrame,
                         threshold: float = 0.5) -> DataFrame:
    """nodes + scored edges -> clusters (url, cluster_id, node_ids, proba, algo).

    One co-partitioned groupBy on url; singletons (nodes without a
    continue-edge) become their own cluster, matching the reference.
    """
    n = nodes.select("url", "node_id")
    e = edge_scores.select(
        "url", "src", "dst", "p_continue",
        F.lit(None).cast("string").alias("node_id"),
    )
    merged = n.select(
        "url", "node_id",
        F.lit(None).cast("string").alias("src"),
        F.lit(None).cast("string").alias("dst"),
        F.lit(None).cast("double").alias("p_continue"),
    ).unionByName(e.select("url", "node_id", "src", "dst", "p_continue"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        node_ids = sorted(pdf.loc[pdf["node_id"].notna(), "node_id"].unique())
        edges = pdf.loc[pdf["src"].notna(), ["src", "dst", "p_continue"]]
        clusters = cluster_doc(node_ids, edges, threshold)
        rows = [
            dict(url=url, cluster_id=i, node_ids=c, proba=None, algo="cc")
            for i, c in enumerate(clusters)
        ]
        cols = [f.name for f in CLUSTERS_SCHEMA.fields]
        return pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    return merged.groupBy("url").applyInPandas(run, schema=CLUSTERS_SCHEMA)
