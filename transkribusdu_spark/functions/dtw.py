"""Dynamic time warping (SURVEY.md §2.10 E2; reference ``util/dtw.py:18-53``):
used by the partition evaluator to align predicted against ground-truth
segment sequences. Vectorized-row numpy DP, per document inside UDF
batches."""

from __future__ import annotations

import numpy as np


def dtw_distance(cost: np.ndarray) -> tuple[float, list[tuple[int, int]]]:
    """cost: [n, m] pairwise distance matrix. Returns (total cost along
    the optimal monotone alignment, the alignment path)."""
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        # vectorized min over the three predecessors for the whole row
        prev = np.minimum(acc[i - 1, 1:], np.minimum(acc[i - 1, :-1], acc[i, :-1]))
        # acc[i, :-1] updates left-to-right; do it scalar for correctness
        for j in range(1, m + 1):
            acc[i, j] = cost[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i - 1, j - 1], acc[i, j - 1]
            )
    # backtrack
    path = []
    i, j = n, m
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        steps = [(acc[i - 1, j - 1], i - 1, j - 1), (acc[i - 1, j], i - 1, j), (acc[i, j - 1], i, j - 1)]
        _, i, j = min(steps)
    path.reverse()
    return float(acc[n, m]), path


def align_partitions(gt_sets: list[set], pred_sets: list[set]) -> float:
    """E2 partition alignment score: DTW over (1 - Jaccard) costs between
    ordered segment member-sets; returns mean matched Jaccard."""
    if not gt_sets or not pred_sets:
        return 0.0
    cost = np.zeros((len(gt_sets), len(pred_sets)))
    for i, a in enumerate(gt_sets):
        for j, b in enumerate(pred_sets):
            u = len(a | b)
            cost[i, j] = 1.0 - (len(a & b) / u if u else 0.0)
    _, path = dtw_distance(cost)
    sims = [1.0 - cost[i, j] for i, j in path]
    return float(np.mean(sims)) if sims else 0.0
