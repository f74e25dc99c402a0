"""Linear separator (SURVEY.md §2.8 C7; reference
``util/statSeparator.py:11-27`` wraps sklearn's linear SVC).

No sklearn in this container, and none needed: for two SEPARABLE point
sets the max-margin separator is the perpendicular bisector of the
closest pair of points between the two convex hulls. Exact, closed
form, deterministic — computed with a monotone-chain hull and a
brute-force point/segment distance over hull edges (separator inputs
are small: cluster centroids, cut candidates).

Returns (a, b) for the line y = a*x + b, matching the reference's
return convention (``statSeparator.py:22-26``).
"""

from __future__ import annotations

import numpy as np


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns hull vertices in CCW order."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _seg_point_closest(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ab = b - a
    denom = float(ab @ ab)
    t = 0.0 if denom == 0 else float(np.clip((p - a) @ ab / denom, 0.0, 1.0))
    return a + t * ab


def closest_pair_between_hulls(ha: np.ndarray, hb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Closest points (p in hull A, q in hull B) by brute force over
    vertex-vs-edge pairs (exact for disjoint convex polygons)."""
    best = None
    best_pq = None

    def edges(h):
        if len(h) == 1:
            return [(h[0], h[0])]
        return [(h[i], h[(i + 1) % len(h)]) for i in range(len(h))]

    for p in ha:
        for a, b in edges(hb):
            q = _seg_point_closest(p, a, b)
            d = float(np.sum((p - q) ** 2))
            if best is None or d < best:
                best, best_pq = d, (p.copy(), q.copy())
    for q in hb:
        for a, b in edges(ha):
            p = _seg_point_closest(q, a, b)
            d = float(np.sum((p - q) ** 2))
            if best is None or d < best:
                best, best_pq = d, (p.copy(), q.copy())
    return best_pq


def get_linear_separator(X: np.ndarray, Y: np.ndarray) -> tuple[float, float]:
    """Max-margin line y = a*x + b between classes Y==0 and Y==1
    (reference ``getLinearSeparator`` semantics, sklearn-free)."""
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y)
    ha = convex_hull(X[Y == 1])
    hb = convex_hull(X[Y == 0])
    p, q = closest_pair_between_hulls(ha, hb)
    w = p - q  # normal direction, pointing to class 1
    m = (p + q) / 2.0
    if abs(w[1]) < 1e-12:
        raise ValueError("separator is vertical; no y = a*x + b form")
    a = -w[0] / w[1]
    b = float(w @ m) / w[1]
    return float(a), float(b)


def linear_separator_1d(values: np.ndarray, labels: np.ndarray) -> tuple[float, float]:
    """1-D special case (projection-profile cuts): returns (threshold,
    margin) where threshold is the midpoint of the empty gap between the
    classes and margin the gap width. Raises if not separable."""
    v0 = np.asarray(values)[np.asarray(labels) == 0]
    v1 = np.asarray(values)[np.asarray(labels) == 1]
    lo_cls, hi_cls = (v0, v1) if v0.max() < v1.min() else (v1, v0)
    if lo_cls.max() >= hi_cls.min():
        raise ValueError("classes are not 1-D separable")
    return float((lo_cls.max() + hi_cls.min()) / 2.0), float(hi_cls.min() - lo_cls.max())
