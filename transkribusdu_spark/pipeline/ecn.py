"""ECN-style graph scorer (SURVEY.md §2.9 M4): edge-conditioned
convolution inference re-expressed as numpy matmuls + segment-sums per
document inside an Arrow UDF, with broadcast weights.

The reference's EdgeConvNet (``gcn/gcn_models.py:440-1515``) computes,
per layer, FW = F.Wᵀ+b plus per-edge-channel sparse message passing
S.diag(cw).Tᵀ.H. Per the north rule we keep the *inference* math (a few
dense matmuls and neighbor sums — numpy is exact for this) and train the
simpler logit models distributedly; weights here come in as plain numpy
arrays (broadcastable dict of lists), so a trained parameter set from
any source slots in.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SCORES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("node_id", T.StringType(), False),
        T.StructField("y_proba", T.ArrayType(T.DoubleType(), False), False),
    ]
)


def init_weights(n_features: int, n_hidden: int, n_classes: int,
                 n_layers: int = 2, seed: int = 42) -> dict:
    """Deterministic Glorot-ish init (a stand-in for trained weights;
    same shapes the reference's ECN would produce)."""
    rng = np.random.default_rng([seed, n_features, n_hidden, n_classes])
    dims = [n_features] + [n_hidden] * n_layers
    ws = []
    for i in range(n_layers):
        lim = float(np.sqrt(6.0 / (dims[i] + dims[i + 1])))
        ws.append(rng.uniform(-lim, lim, size=(dims[i], dims[i + 1])).tolist())
    lim = float(np.sqrt(6.0 / (dims[-1] + n_classes)))
    w_out = rng.uniform(-lim, lim, size=(dims[-1], n_classes)).tolist()
    return {"ws": ws, "w_out": w_out}


def _forward(nf: np.ndarray, src: np.ndarray, dst: np.ndarray, weights: dict) -> np.ndarray:
    """One document: node features [N,F], edge index arrays -> class
    probabilities [N,K]. Message passing = mean over in/out neighbors
    (segment-sum via np.add.at), relu between layers."""
    h = nf
    deg = np.zeros(len(nf))
    np.add.at(deg, src, 1.0)
    np.add.at(deg, dst, 1.0)
    deg = np.maximum(deg, 1.0)
    for w in weights["ws"]:
        w = np.asarray(w)
        hw = h @ w
        msg = np.zeros_like(hw)
        np.add.at(msg, dst, hw[src])
        np.add.at(msg, src, hw[dst])
        h = np.maximum(hw + msg / deg[:, None], 0.0)
    logits = h @ np.asarray(weights["w_out"])
    logits -= logits.max(axis=1, keepdims=True)
    e = np.exp(logits)
    return e / e.sum(axis=1, keepdims=True)


def ecn_score(nodes_feats: DataFrame, edges: DataFrame, weights: dict,
              feature_cols: list[str]) -> DataFrame:
    """Distributed ECN inference: co-group node features and edges per
    url, run the numpy forward pass, emit per-node class probabilities.
    ``weights`` is broadcast by closure capture (tiny)."""
    nf_rows = nodes_feats.select("url", "node_id", *feature_cols)
    e_rows = edges.select("url", "src", "dst")

    def run(key, nfs: pd.DataFrame, es: pd.DataFrame) -> pd.DataFrame:
        url = key[0]
        ids = nfs["node_id"].to_numpy()
        idx = {n: i for i, n in enumerate(ids)}
        nf = nfs[feature_cols].to_numpy(dtype=np.float64)
        pairs = [
            (idx[s], idx[d])
            for s, d in zip(es["src"], es["dst"])
            if s in idx and d in idx
        ]
        src = np.array([p[0] for p in pairs], dtype=np.int64)
        dst = np.array([p[1] for p in pairs], dtype=np.int64)
        proba = _forward(nf, src, dst, weights)
        return pd.DataFrame({
            "url": url, "node_id": ids,
            "y_proba": [np.round(p, 6).tolist() for p in proba],
        })

    return nf_rows.groupBy("url").cogroup(e_rows.groupBy("url")).applyInPandas(
        run, schema=SCORES_SCHEMA
    )
