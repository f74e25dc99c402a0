"""XY-cut, viterbi, agglomerative merge, dual graph, tf-idf, salting."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from transkribusdu_spark.functions.viterbi import viterbi_decode
from transkribusdu_spark.functions.xycut import merge_intervals, xy_cut
from transkribusdu_spark.pipeline.conjugate import dual_graph, duplicate_directed
from transkribusdu_spark.pipeline.segment import agglomerate_doc


def test_merge_intervals_min_gap():
    # mirrors reference XYcut iMin semantics (util/XYcut.py:14-67)
    assert merge_intervals([(0, 10), (12, 20)], 5) == [(0, 20)]
    assert merge_intervals([(0, 10), (12, 20)], 1) == [(0, 10), (12, 20)]
    assert merge_intervals([(0, 5), (4, 8), (20, 30)], 2) == [(0, 8), (20, 30)]
    assert merge_intervals([], 3) == []


def test_xy_cut_rows_then_columns():
    boxes = np.array([
        [0, 0, 10, 10], [20, 0, 30, 10],     # row 1: two columns
        [0, 40, 30, 50],                     # row 2: one wide block
    ], dtype=float)
    groups = xy_cut(boxes, min_gap_x=5, min_gap_y=5)
    flat = sorted(i for g in groups for i in g)
    assert flat == [0, 1, 2]
    assert len(groups) == 3  # two columns split + bottom block


def test_viterbi_simple_chain():
    # 2 states; strong self-transition; emissions force 0,0,1
    log_emit = np.log(np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9]]))
    log_trans = np.log(np.array([[0.8, 0.2], [0.2, 0.8]]))
    path, score = viterbi_decode(log_emit, log_trans)
    assert path.tolist() == [0, 0, 1]
    assert score < 0


def test_agglomerate_merges_positive_pairs():
    edges = pd.DataFrame({
        "src": ["a", "b", "c"],
        "dst": ["b", "c", "d"],
        "p_continue": [0.9, 0.6, 0.2],  # a-b, b-c attract; c-d repels
    })
    got = agglomerate_doc(["a", "b", "c", "d"], edges, seed_threshold=0.99)
    assert ["a", "b", "c"] in got and ["d"] in got


def test_agglomerate_seeds_at_high_threshold():
    edges = pd.DataFrame({"src": ["a"], "dst": ["b"], "p_continue": [0.995]})
    got = agglomerate_doc(["a", "b", "c"], edges, seed_threshold=0.99)
    assert got == [["a", "b"], ["c"]]


def test_dual_graph_join_formulation(spark):
    pdf = pd.DataFrame({
        "url": ["u"] * 3,
        "src": ["a", "b", "c"],
        "dst": ["b", "c", "d"],
    })
    edges = spark.createDataFrame(pdf)
    dual = dual_graph(edges).toPandas()
    pairs = set(zip(dual.e1, dual.e2))
    # a|b and b|c share b; b|c and c|d share c; a|b vs c|d share nothing
    assert pairs == {("a|b", "b|c"), ("b|c", "c|d")}
    directed = duplicate_directed(dual_graph(edges))
    assert directed.count() == 2 * len(dual)


def test_tfidf_fit_apply(spark, sf_dir):
    from transkribusdu_spark.pipeline.features import apply_tfidf, fit_tfidf_vocab
    from transkribusdu_spark.pipeline.parse import parse_pages
    from transkribusdu_spark.synth import pages_from_documents

    nodes = parse_pages(pages_from_documents(spark, sf_dir)).limit(200).cache()
    vocab = fit_tfidf_vocab(nodes, n=3, max_features=50)
    v = vocab.toPandas()
    assert len(v) == 50
    assert v["idx"].tolist() == sorted(v["idx"].tolist())
    sparse = apply_tfidf(nodes, vocab, n=3)
    row = sparse.limit(1).collect()[0]
    assert len(row.indices) == len(row.values)
    assert all(x >= 0 for x in row.indices)


def test_salted_host_counts_match_plain(spark, sf_dir):
    from transkribusdu_spark.plans.salting import docs_per_host_salted, host_of_url
    from transkribusdu_spark.synth import pages_from_documents

    pages = pages_from_documents(spark, sf_dir).cache()
    salted = docs_per_host_salted(pages).toPandas().set_index("host")["n_docs"]
    plain = (
        pages.groupBy(host_of_url().alias("host")).count().toPandas()
        .set_index("host")["count"]
    )
    assert salted.sort_index().tolist() == plain.sort_index().tolist()
    # Zipf skew is real: the hottest host dominates
    assert plain.max() > plain.median() * 5
