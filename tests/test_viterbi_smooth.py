"""Viterbi label smoothing over reading-order sequences."""

from pyspark.sql import functions as F

from transkribusdu_spark.pipeline.model import viterbi_smooth


def test_isolated_flip_is_smoothed(spark):
    # run of confident 'main' with one weak 'boilerplate' blip in the
    # middle: sticky transitions flip the blip back to 'main'
    rows = []
    for i, p_main in enumerate([0.9, 0.9, 0.45, 0.9, 0.9]):
        rows.append(("u", f"n{i}", 1, float(i * 100), 0.0, [1.0 - p_main, p_main]))
    df = spark.createDataFrame(
        rows, "url string, node_id string, page_num int, y1 double, x1 double, y_proba array<double>"
    )
    out = {r.node_id: r.smoothed_label for r in viterbi_smooth(df).collect()}
    assert out == {f"n{i}": "main" for i in range(5)}


def test_confident_boundary_is_kept(spark):
    rows = []
    seq = [0.95, 0.9, 0.1, 0.05, 0.08]  # real main->boilerplate boundary
    for i, p_main in enumerate(seq):
        rows.append(("u", f"n{i}", 1, float(i * 100), 0.0, [1.0 - p_main, p_main]))
    df = spark.createDataFrame(
        rows, "url string, node_id string, page_num int, y1 double, x1 double, y_proba array<double>"
    )
    out = {r.node_id: r.smoothed_label for r in viterbi_smooth(df).collect()}
    assert out["n0"] == out["n1"] == "main"
    assert out["n2"] == out["n3"] == out["n4"] == "boilerplate"
