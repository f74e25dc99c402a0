"""Viterbi decoding (SURVEY.md §2.8 C11; reference ``spm/viterbi.py:10-42``):
generic max-product HMM decoder, vectorized numpy — used per document
inside Arrow UDF batches for sequence labeling over reading-order node
sequences (e.g. BIESO row tagging)."""

from __future__ import annotations

import numpy as np


def viterbi_decode(
    log_emit: np.ndarray,  # [T, K] log emission scores
    log_trans: np.ndarray,  # [K, K] log transition scores
    log_start: np.ndarray | None = None,  # [K]
) -> tuple[np.ndarray, float]:
    """Returns (best path int[T], best log score). Vectorized over K."""
    T, K = log_emit.shape
    if log_start is None:
        log_start = np.zeros(K)
    delta = log_start + log_emit[0]
    back = np.zeros((T, K), dtype=np.int64)
    for t in range(1, T):
        cand = delta[:, None] + log_trans  # [K_prev, K]
        back[t] = np.argmax(cand, axis=0)
        delta = cand[back[t], np.arange(K)] + log_emit[t]
    path = np.zeros(T, dtype=np.int64)
    path[-1] = int(np.argmax(delta))
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]
    return path, float(np.max(delta))
