"""Edge text/geometry features + class shifting (F7/F13/F14/F15/F16).

The shifter expected-matrices mirror the reference unit tests
(``graph/FeatureDefinition_Standard.py:382-554``): the 1-hot block is
preserved, each edge's features land in its class's block, all other
blocks are zero.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from transkribusdu_spark.pipeline.edgefeats import (
    EDGE_GEOM21_COLS,
    edge_class_shift,
    edge_geometry21,
    edge_text_features,
    edge_text_tfidf,
    fit_edge_text_vocab,
    lcs_length_np,
    lcs_ratio_py,
    neighbor_text_concat,
)
from transkribusdu_spark.pipeline.edges import build_edges
from transkribusdu_spark.pipeline.features import edge_features
from transkribusdu_spark.pipeline.parse import parse_pages
from transkribusdu_spark.synth import pages_from_documents


def _lcs_ref(a, b):
    """Reference DP (Transformer_PageXml.py:594-618) for cross-checking."""
    na, nb = len(a), len(b)
    if nb < na:
        a, na, b, nb = b, nb, a, na
    if na == 0:
        return 0
    cur, prev = [0] * (na + 1), [0] * (na + 1)
    for i in range(nb):
        bi = b[i]
        prev, cur = cur, prev
        best = 0
        for j in range(1, na + 1):
            best = max(1 + prev[j - 1] if bi == a[j - 1] else 0, prev[j], best)
            cur[j] = best
    return cur[na]


def test_lcs_kernel_matches_reference_dp():
    import random

    rnd = random.Random(7)
    for _ in range(500):
        a = "".join(rnd.choices("abcd ", k=rnd.randint(0, 40)))
        b = "".join(rnd.choices("abcd ", k=rnd.randint(0, 40)))
        assert lcs_length_np(a, b) == _lcs_ref(a, b)
    assert lcs_ratio_py("", "") == 0.0
    assert lcs_ratio_py("abc", "abc") == 1.0


def test_edge_class_shift_expected_matrix(spark):
    """Mirror of test_Pipeline_of_EdgeClassShifter: V edge then H edge,
    two features; 1-hot preserved, features in the class block."""
    df = spark.createDataFrame(
        [("V", 1.0, 2.0), ("H", 3.0, 4.0)], "etype string, f1 double, f2 double"
    )
    onehot = df.select(
        "*",
        (F.col("etype") == "H").cast("double").alias("ef_is_h"),
        (F.col("etype") == "V").cast("double").alias("ef_is_v"),
        (F.col("etype") == "CP").cast("double").alias("ef_is_cp"),
    )
    shifted, cols = edge_class_shift(onehot, ["f1", "f2"])
    assert cols == ["sf0_f1", "sf0_f2", "sf1_f1", "sf1_f2", "sf2_f1", "sf2_f2"]
    rows = {r.etype: r for r in shifted.collect()}
    # V edge: 1-hot (0,1,0); features in block 1 (V), zeros elsewhere
    v = rows["V"]
    assert (v.ef_is_h, v.ef_is_v, v.ef_is_cp) == (0.0, 1.0, 0.0)
    assert (v.sf0_f1, v.sf0_f2, v.sf1_f1, v.sf1_f2, v.sf2_f1, v.sf2_f2) == (
        0.0, 0.0, 1.0, 2.0, 0.0, 0.0,
    )
    # H edge: 1-hot (1,0,0); features in block 0 (H)
    h = rows["H"]
    assert (h.ef_is_h, h.ef_is_v, h.ef_is_cp) == (1.0, 0.0, 0.0)
    assert (h.sf0_f1, h.sf0_f2, h.sf1_f1, h.sf1_f2, h.sf2_f1, h.sf2_f2) == (
        3.0, 4.0, 0.0, 0.0, 0.0, 0.0,
    )


def test_edge_geometry21_expected_row(spark):
    """Hand-computed expected values for one vertical edge (the analogue
    of test_Edge_Geometry for the current 21-col selector,
    FeatureDefinition_Standard.py:240-280): A=(0,0,10,10),
    B=(0,10,10,110) stacked vertically, page 100x100, length 0,
    overlap 10 (full x-overlap)."""
    edges = spark.createDataFrame(
        [("u", 1, "a", "b", "V", 0.0, 10.0, 10.0 / (10.0 + 10.0 - 10.0))],
        "url string, page_num int, src string, dst string, etype string, "
        "length double, overlap double, iou double",
    )
    nodes = spark.createDataFrame(
        [
            ("u", "a", 0.0, 0.0, 10.0, 10.0, 100.0, 100.0, "x"),
            ("u", "b", 0.0, 10.0, 10.0, 110.0, 100.0, 100.0, "x"),
        ],
        "url string, node_id string, x1 double, y1 double, x2 double, y2 double, "
        "page_w double, page_h double, label string",
    )
    g = edge_geometry21(edge_features(edges, nodes)).select(*EDGE_GEOM21_COLS).collect()[0]
    # x-overlap interval [0,10] -> midpoint m=5 (the reference's
    # computeOverlapPosition first element); pA = (10-0-10)/10 = 0, pB same.
    assert g.eg_l == 0.0 and g.eg_l_sq == 0.0
    assert g.eg_lnh == 0.0 and g.eg_lnv == 0.0
    assert g.eg_ovrl == 10.0 and g.eg_ovrl_sq == 100.0
    assert g.eg_ovm == 5.0 and g.eg_ovm_sq == 25.0
    assert g.eg_iou == pytest.approx(1.0)
    assert g.eg_rovrl == pytest.approx((10.0 + 0.001) / (0.001 + 5.0))
    assert g.eg_space == 0.0
    assert g.eg_rovrl_per_l == pytest.approx(g.eg_rovrl / 1.0)
    assert g.eg_pa == 0.0 and g.eg_pb == 0.0


def test_edge_text_and_neighbor_features_e2e(spark, sf_dir):
    nodes = parse_pages(pages_from_documents(spark, sf_dir)).filter(
        F.col("doc_id") < 20
    ).cache()
    edges = build_edges(nodes)
    et = edge_text_features(edges, nodes)
    rows = et.select("ef_lcs_ratio").collect()
    assert rows and all(0.0 <= r.ef_lcs_ratio <= 1.0 for r in rows)
    # identical texts (repeated headers across pages, CP edges) hit 1.0
    assert any(r.ef_lcs_ratio == 1.0 for r in rows)

    nt = neighbor_text_concat(nodes, edges)
    assert nt.count() == nodes.count()
    joined = nt.join(nodes.select("url", "node_id", "label"), ["url", "node_id"])
    hdr = joined.filter(F.col("label") == "header").select("neighbor_text").collect()
    # headers see at least one neighbour on every page with content
    assert sum(1 for r in hdr if r.neighbor_text) > 0

    vocab = fit_edge_text_vocab(nodes, n=3, max_features=50)
    etf = edge_text_tfidf(edges, nodes, vocab)
    r = etf.filter(F.col("src_indices").isNotNull()).first()
    assert r is not None and len(r.src_indices) == len(r.src_values)
    assert list(r.src_indices) == sorted(r.src_indices)


def test_edge_classifier_with_text_and_shifted_features(spark, sf_dir):
    """F13+F16 wired into the conjugate edge model: geometry + LCS,
    shifted per class, must separate continue/break well on GT labels."""
    from transkribusdu_spark.pipeline.features import EDGE_FEATURE_COLS
    from transkribusdu_spark.pipeline.model import predict_edges, train_edge_classifier

    nodes = parse_pages(pages_from_documents(spark, sf_dir)).filter(
        F.col("doc_id") < 60
    ).cache()
    ef = edge_features(build_edges(nodes), nodes)
    ef = edge_text_features(ef, nodes)
    base_cols = EDGE_FEATURE_COLS + ["ef_lcs_ratio"]
    shifted, scols = edge_class_shift(ef, base_cols)
    cols = ["ef_is_h", "ef_is_v", "ef_is_cp"] + scols
    model = train_edge_classifier(shifted.cache(), feature_cols=cols)
    pred = predict_edges(model, shifted, feature_cols=cols)
    scored = pred.join(shifted.select("url", "src", "dst", "src_label", "dst_label"),
                       ["url", "src", "dst"])
    acc = scored.select(
        F.avg(
            (
                (F.col("p_break") >= 0.5)
                == (F.col("src_label") != F.col("dst_label"))
            ).cast("double")
        ).alias("acc")
    ).collect()[0].acc
    assert acc >= 0.8, f"edge classifier accuracy {acc}"


def test_conjugate_pipeline_end_to_end_clustering(spark, sf_dir):
    """The reference's operating mode: TRAIN the conjugate edge
    classifier (geometry + LCS, class-shifted), predict continue/break,
    cluster by connected components, and score the partition against the
    label ground truth — the full conjugate loop, not the edge oracle."""
    from transkribusdu_spark.pipeline.edgefeats import edge_class_shift
    from transkribusdu_spark.pipeline.features import EDGE_FEATURE_COLS
    from transkribusdu_spark.pipeline.model import predict_edges, train_edge_classifier
    from transkribusdu_spark.pipeline.segment import connected_components
    from transkribusdu_spark.pipeline.tablerows import compute_prf, eval_partitions

    nodes = parse_pages(pages_from_documents(spark, sf_dir)).filter(
        F.col("doc_id") < 80
    ).cache()
    ef = edge_text_features(edge_features(build_edges(nodes), nodes), nodes)
    base_cols = EDGE_FEATURE_COLS + ["ef_lcs_ratio"]
    shifted, scols = edge_class_shift(ef, base_cols)
    cols = ["ef_is_h", "ef_is_v", "ef_is_cp"] + scols
    model = train_edge_classifier(shifted.cache(), feature_cols=cols)
    scores = predict_edges(model, shifted, feature_cols=cols)
    clusters = connected_components(nodes, scores)

    # score predicted partitions against label-partition ground truth
    memb = clusters.select("url", "cluster_id", F.explode("node_ids").alias("node_id"))
    j = memb.join(nodes.select("url", "node_id", "label"), ["url", "node_id"]).toPandas()
    total_ok = total_err = total_miss = 0
    for url, g in j.groupby("url"):
        runp = [gg["node_id"].tolist() for _, gg in g.groupby("cluster_id")]
        gtp = [gg["node_id"].tolist() for _, gg in g.groupby("label")]
        ok, err, miss = eval_partitions(runp, gtp, th=0.8)
        total_ok += ok
        total_err += err
        total_miss += miss
    p, r, f1 = compute_prf(total_ok, total_err, total_miss)
    assert f1 >= 0.55, f"conjugate clustering f1 {f1} (ok={total_ok} err={total_err} miss={total_miss})"
