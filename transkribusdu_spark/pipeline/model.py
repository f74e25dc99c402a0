"""Scoring models: node labeling + conjugate edge (continue/break) scoring.

Reference semantics (SURVEY.md §2.9): the CRF/ECN models are replaced —
per the north rule — by logistic models over the same features (the
reference's own baseline, M6: ``graph/GraphModel.py:324-390``,
``gcn/gcn_models.py:297-438``), plus the *edge oracle* mode (M8,
``tasks/DU_Task.py:813-818``): an edge is ``break`` iff its endpoint
labels differ — used to validate clustering independently of a trained
model, exactly as the reference does.

Spark-first: training is ``spark.ml`` LogisticRegression (distributed
L-BFGS over the executors); inference stays JVM-side (no Python).
Fitted coefficients are tiny and broadcast implicitly by the ML
transformer — the analogue of the reference's pickled-model load.
"""

from __future__ import annotations

import pandas as pd
from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import MAIN_CONTENT_LABELS
from .features import EDGE_FEATURE_COLS, NODE_FEATURE_COLS


# ---------------------------------------------------------------------------
# Edge oracle (M8) — ground-truth edge labels from node labels.
# ---------------------------------------------------------------------------
def edge_oracle_scores(edge_feats: DataFrame) -> DataFrame:
    """p_break = 1 iff endpoint labels differ (reference
    ``GraphBinaryConjugateSegmenter.computeEdgeLabels``)."""
    brk = (F.col("src_label") != F.col("dst_label")).cast("double")
    return edge_feats.select(
        "url", "src", "dst",
        (F.lit(1.0) - brk).alias("p_continue"),
        brk.alias("p_break"),
    )


# ---------------------------------------------------------------------------
# Node classifier: main-content vs boilerplate (M6 over node features).
# ---------------------------------------------------------------------------
def _assemble(df: DataFrame, cols: list[str]) -> DataFrame:
    return VectorAssembler(inputCols=cols, outputCol="features", handleInvalid="keep").transform(df)


def train_node_classifier(node_feats: DataFrame, label_col: str = "label",
                          reg_param: float = 0.01) -> LogisticRegressionModel:
    """Binary main-content classifier trained on nf_* features with
    ground-truth labels (distributed fit; labels from the synthesizer
    play the role of the reference's annotated PageXML)."""
    train = node_feats.withColumn(
        "y", F.col(label_col).isin(list(MAIN_CONTENT_LABELS)).cast("double")
    )
    train = _assemble(train, NODE_FEATURE_COLS)
    lr = LogisticRegression(featuresCol="features", labelCol="y", regParam=reg_param, maxIter=50)
    return lr.fit(train)


def predict_nodes(model: LogisticRegressionModel, node_feats: DataFrame) -> DataFrame:
    """JVM-side inference; emits predicted label + probability column
    (the reference's ``@DU_Y`` proba attribute analogue, P7)."""
    scored = model.transform(_assemble(node_feats, NODE_FEATURE_COLS))
    return scored.withColumn(
        "pred_label",
        F.when(F.col("prediction") == 1.0, F.lit("main")).otherwise(F.lit("boilerplate")),
    ).withColumn("y_proba", vector_to_array(F.col("probability"))).drop(
        "features", "rawPrediction", "probability", "prediction"
    )


# ---------------------------------------------------------------------------
# Edge classifier: continue/break over ef_* features (conjugate mode).
# ---------------------------------------------------------------------------
def apply_atmostone(
    scored: DataFrame,
    label: str,
    proba_col: str,
    fallback: str = "other",
    pred_col: str = "pred_label",
    scope: tuple[str, ...] = ("url", "page_num"),
) -> DataFrame:
    """Hard logical constraint ATMOSTONE (reference M2 AD3+ constraints,
    ``graph/Graph.py:234-266``): within each scope (default: page), keep
    ``label`` only on the highest-probability node; demote the rest to
    ``fallback``. Declarative window argmax — no inference engine needed."""
    from pyspark.sql import Window

    # rank only within the constrained label's group per scope
    w = Window.partitionBy(*[F.col(c) for c in scope], F.col(pred_col)).orderBy(
        F.desc(proba_col), F.asc("node_id")
    )
    ranked = scored.withColumn(
        "_r", F.row_number().over(w)
    )
    return ranked.withColumn(
        pred_col,
        F.when((F.col(pred_col) == label) & (F.col("_r") > 1), F.lit(fallback)).otherwise(
            F.col(pred_col)
        ),
    ).drop("_r")


def apply_xor(
    scored: DataFrame,
    label: str,
    proba_col: str,
    fallback: str = "other",
    pred_col: str = "pred_label",
    scope: tuple[str, ...] = ("url", "page_num"),
) -> DataFrame:
    """Hard logical constraint XOR — EXACTLY one node carries ``label``
    per scope (reference M2 AD3+ constraint family, ``graph/Graph.py:
    234-266``): the highest-``proba_col`` node in the scope gets the
    label (even if the model preferred another one — the at-least-one
    half), every other candidate is demoted to ``fallback`` (the
    at-most-one half). Declarative window argmax, no inference engine."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in scope]).orderBy(
        F.desc(proba_col), F.asc("node_id")
    )
    ranked = scored.withColumn("_r", F.row_number().over(w))
    return ranked.withColumn(
        pred_col,
        F.when(F.col("_r") == 1, F.lit(label)).otherwise(
            F.when(F.col(pred_col) == label, F.lit(fallback)).otherwise(F.col(pred_col))
        ),
    ).drop("_r")


def fit_label_transitions(
    nodes: DataFrame,
    classes: tuple[str, ...] = ("boilerplate", "main"),
    label_col: str = "label",
):
    """Fit the class-transition matrix from training labels: bigram
    counts along reading order (window lag + groupBy — one distributed
    pass). A *fitted* matrix is essential: a naive sticky prior assumes
    runs, but real layouts switch main/boilerplate at every page
    boundary, and a wrong prior makes smoothing strictly worse
    (measured: 278/500 -> 0/500 byte-identical)."""
    import numpy as np
    from pyspark.sql import Window

    is_main = F.col(label_col).isin(list(MAIN_CONTENT_LABELS)).cast("int")
    w = Window.partitionBy("url").orderBy("page_num", "y1", "x1", "node_id")
    pairs = (
        nodes.withColumn("c", is_main)
        .withColumn("c_next", F.lead("c").over(w))
        .filter(F.col("c_next").isNotNull())
        .groupBy("c", "c_next")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    k = len(classes)
    counts = np.ones((k, k))  # add-one smoothing
    for r in pairs:
        counts[r.c, r.c_next] += r.n
    return np.log(counts / counts.sum(axis=1, keepdims=True))


def viterbi_smooth(
    scored: DataFrame,
    log_trans=None,
    proba_col: str = "y_proba",
    classes: tuple[str, ...] = ("boilerplate", "main"),
    self_transition: float = 0.8,
) -> DataFrame:
    """Sequence smoothing of per-node class probabilities along reading
    order (C11 applied): Viterbi decode against a transition matrix —
    pass the ``fit_label_transitions`` output for a learned matrix,
    else a sticky default is used. Per-document DP inside
    ``applyInPandas`` (reading-order sequences are short).

    Measured caveat (sf0.01 synthetic corpus): when the node classifier
    is already strong with near-independent errors, smoothing REDUCES
    document-perfect extraction (raw 278/500 vs learned-trans 153/500 vs
    sticky 0/500) — use it when per-node scores are noisy relative to
    layout transitions, not as a default post-process."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..functions.viterbi import viterbi_decode

    k = len(classes)
    if log_trans is None:
        off = (1.0 - self_transition) / max(k - 1, 1)
        log_trans = np.log(np.full((k, k), off) + np.eye(k) * (self_transition - off))

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("node_id", T.StringType()),
            T.StructField("smoothed_label", T.StringType()),
        ]
    )
    src = scored.select("url", "node_id", "page_num", "y1", "x1", proba_col)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["page_num", "y1", "x1", "node_id"])
        proba = np.clip(np.array(list(pdf[proba_col])), 1e-9, 1.0)
        path, _ = viterbi_decode(np.log(proba), log_trans)
        return pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "node_id": pdf["node_id"].to_numpy(),
                "smoothed_label": [classes[i] for i in path],
            }
        )

    return src.groupBy("url").applyInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Deterministic closed-form node classifier (diagonal LDA over
# integer-valued features). spark.ml L-BFGS is not bit-stable across
# partitionings, so the learned-extraction contract query uses THIS
# model: every fitted quantity derives from exact integer sums
# (count/sum/sum-of-squares, all < 2^53), so the fit and the scores are
# bit-reproducible across engines, partition orders, and cluster sizes
# — hash-gateable against the independent single-node oracle
# (tools/make_truth.py mirrors the identical spec).
# ---------------------------------------------------------------------------
# Integer-valued node features for the deterministic model, in the
# FIXED order the score expression sums them (float op order matters).
LDA_FEATURES = ("ld_chars", "ld_spaces", "ld_w", "ld_h")


def _lda_feature_cols(nodes: DataFrame) -> DataFrame:
    txt = F.coalesce(F.col("text"), F.lit(""))
    return nodes.withColumn("ld_chars", F.length(txt).cast("double")).withColumn(
        "ld_spaces", (F.length(txt) - F.length(F.replace(txt, F.lit(" "), F.lit("")))).cast("double")
    ).withColumn("ld_w", F.col("x2") - F.col("x1")).withColumn("ld_h", F.col("y2") - F.col("y1"))


def fit_lda_params(nodes: DataFrame, label_col: str = "label") -> dict:
    """Closed-form fit: per-class counts, sums, sums of squares (one
    distributed aggregation, 2 result rows) -> per-feature weights
    w_f = (mu1_f - mu0_f) / (pooled_var_f + 1) and intercept
    b = ln(n1/n0) - sum_f w_f * (mu1_f + mu0_f) / 2."""
    import math

    ft = _lda_feature_cols(nodes).withColumn(
        "y", F.col(label_col).isin(list(MAIN_CONTENT_LABELS)).cast("int")
    )
    aggs = [F.count("*").alias("n")]
    for c in LDA_FEATURES:
        aggs.append(F.sum(c).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"q_{c}"))
    rows = {r["y"]: r for r in ft.groupBy("y").agg(*aggs).collect()}
    if 0 not in rows or 1 not in rows:
        present = sorted(rows)
        raise ValueError(
            "fit_lda_params needs both classes present (main-content and "
            f"non-main nodes); got only y={present}. A single-class corpus "
            "has no discriminative direction — filter upstream or use a "
            "prior-only classifier."
        )
    n0, n1 = float(rows[0]["n"]), float(rows[1]["n"])
    ws, mid = [], []
    for c in LDA_FEATURES:
        s0, s1 = float(rows[0][f"s_{c}"]), float(rows[1][f"s_{c}"])
        q = float(rows[0][f"q_{c}"]) + float(rows[1][f"q_{c}"])
        mu0, mu1 = s0 / n0, s1 / n1
        var = (q - s0 * mu0 - s1 * mu1) / (n0 + n1 - 2.0) + 1.0
        ws.append((mu1 - mu0) / var)
        mid.append((mu0 + mu1) / 2.0)
    b = math.log(n1 / n0)
    for w, m in zip(ws, mid):
        b = b - w * m
    return {"w": ws, "b": b}


def predict_nodes_lda(nodes: DataFrame, params: dict) -> DataFrame:
    """Score with broadcast closed-form weights: one Arrow kernel,
    z = f0*w0 + f1*w1 + f2*w2 + f3*w3 + b (fixed op order, mirrored
    bit-for-bit by the oracle), p_main = sigmoid(z)."""
    import numpy as np

    w = [float(x) for x in params["w"]]
    b = float(params["b"])

    @F.pandas_udf("array<double>")
    def proba(f0: pd.Series, f1: pd.Series, f2: pd.Series, f3: pd.Series) -> pd.Series:
        z = (
            f0.to_numpy(dtype=np.float64) * w[0]
            + f1.to_numpy(dtype=np.float64) * w[1]
            + f2.to_numpy(dtype=np.float64) * w[2]
            + f3.to_numpy(dtype=np.float64) * w[3]
            + b
        )
        p = 1.0 / (1.0 + np.exp(-z))
        return pd.Series([[1.0 - v, v] for v in p])

    ft = _lda_feature_cols(nodes)
    return ft.withColumn("y_proba", proba(*[F.col(c) for c in LDA_FEATURES])).withColumn(
        "pred_label",
        F.when(F.col("y_proba")[1] >= 0.5, F.lit("main")).otherwise(F.lit("boilerplate")),
    ).drop(*LDA_FEATURES)


def train_edge_classifier(
    edge_feats: DataFrame,
    reg_param: float = 0.01,
    feature_cols: list[str] | None = None,
) -> LogisticRegressionModel:
    """Conjugate continue/break edge classifier. ``feature_cols`` defaults
    to the geometry set; pass geometry + ef_lcs_ratio + class-shifted
    blocks (pipeline/edgefeats.py) for the full reference feature space
    (F13/F16)."""
    train = edge_feats.withColumn(
        "y", (F.col("src_label") != F.col("dst_label")).cast("double")
    )
    train = _assemble(train, feature_cols or EDGE_FEATURE_COLS)
    lr = LogisticRegression(featuresCol="features", labelCol="y", regParam=reg_param, maxIter=50)
    return lr.fit(train)


def predict_edges(
    model: LogisticRegressionModel,
    edge_feats: DataFrame,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    scored = model.transform(_assemble(edge_feats, feature_cols or EDGE_FEATURE_COLS))
    proba = vector_to_array(F.col("probability"))
    return scored.select(
        "url", "src", "dst",
        proba.getItem(0).alias("p_continue"),
        proba.getItem(1).alias("p_break"),
    )
