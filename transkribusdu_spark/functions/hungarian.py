"""Hungarian (Kuhn-Munkres) assignment (SURVEY.md §2.10 E3; reference
``util/hungarian.py:22-59`` wraps scipy's linear_sum_assignment — scipy
is not in this container, so this is a self-contained O(n^3) potentials
implementation). Used for optimal cluster-to-ground-truth matching in
evaluation, per document inside UDF batches (cluster counts are small).
"""

from __future__ import annotations

import numpy as np


def linear_sum_assignment(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-cost perfect matching on a rectangular cost matrix.
    Returns (row_idx, col_idx) like scipy. JV-style shortest augmenting
    path with potentials, O(n^2 m)."""
    cost = np.asarray(cost, dtype=np.float64)
    transposed = cost.shape[0] > cost.shape[1]
    if transposed:
        cost = cost.T
    n, m = cost.shape  # n <= m
    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row matched to col j (1-based)
    way = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    rows = np.empty(n, dtype=np.int64)
    for j in range(1, m + 1):
        if p[j] > 0:
            rows[p[j] - 1] = j - 1
    row_idx = np.arange(n)
    col_idx = rows
    if transposed:
        return col_idx, row_idx
    return row_idx, col_idx


def best_cluster_match(gt_sets: list[set], pred_sets: list[set]) -> list[tuple[int, int, float]]:
    """Optimal GT-to-predicted cluster matching maximizing Jaccard
    (reference evaluation semantics). Returns (gt_idx, pred_idx, jaccard)."""
    if not gt_sets or not pred_sets:
        return []
    cost = np.zeros((len(gt_sets), len(pred_sets)))
    for i, a in enumerate(gt_sets):
        for j, b in enumerate(pred_sets):
            un = len(a | b)
            cost[i, j] = -(len(a & b) / un if un else 0.0)
    ri, ci = linear_sum_assignment(cost)
    return [(int(i), int(j), float(-cost[i, j])) for i, j in zip(ri, ci)]
