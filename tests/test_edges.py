"""Line-of-sight edge kernel: literal-layout tests mirroring the
reference's masking/visibility semantics (SURVEY.md §2.3 J1-J8)."""

import pandas as pd
import pytest

from transkribusdu_spark.pipeline.edges import _box_iou, _subtract_seen, doc_edges


def _nodes(rows):
    return pd.DataFrame(
        [
            dict(url="u", page_num=p, node_id=nid, x1=float(x1), y1=float(y1),
                 x2=float(x2), y2=float(y2))
            for nid, p, x1, y1, x2, y2 in rows
        ]
    )


def _pairs(edges, etype):
    return {(r.src, r.dst) for r in edges.itertuples() if r.etype == etype}


def test_stacked_blocks_occlusion():
    # A above B above C, same x-range: A-B and B-C, never A-C (occluded).
    e = doc_edges(_nodes([
        ("A", 1, 100, 100, 500, 150),
        ("B", 1, 100, 200, 500, 250),
        ("C", 1, 100, 300, 500, 350),
    ]))
    assert _pairs(e, "V") == {("A", "B"), ("B", "C")}


def test_partial_occlusion_keeps_visible_slice():
    # B covers only the left half between A and C: A sees B (left) and C
    # (right half remains visible through the mask).
    e = doc_edges(_nodes([
        ("A", 1, 100, 100, 500, 150),
        ("B", 1, 100, 200, 300, 250),
        ("C", 1, 100, 300, 500, 350),
    ]))
    v = _pairs(e, "V")
    assert ("A", "B") in v and ("A", "C") in v and ("B", "C") in v


def test_full_occlusion_by_two_halves():
    # B and C side by side fully cover A's span: D below is not visible.
    e = doc_edges(_nodes([
        ("A", 1, 100, 100, 500, 150),
        ("B", 1, 100, 200, 300, 250),
        ("C", 1, 300, 200, 500, 250),
        ("D", 1, 100, 300, 500, 350),
    ]))
    v = _pairs(e, "V")
    assert ("A", "B") in v and ("A", "C") in v
    assert ("A", "D") not in v


def test_horizontal_edges():
    e = doc_edges(_nodes([
        ("L", 1, 100, 100, 200, 300),
        ("R", 1, 300, 100, 400, 300),
    ]))
    assert _pairs(e, "H") == {("L", "R")}
    assert _pairs(e, "V") == set()


def test_no_edge_without_projection_overlap():
    # Diagonal blocks: no x-overlap, no y-overlap -> no V/H edges.
    e = doc_edges(_nodes([
        ("A", 1, 100, 100, 200, 200),
        ("B", 1, 300, 300, 400, 400),
    ]))
    assert len(e[e.etype.isin(["V", "H"])]) == 0


def test_edge_attributes():
    e = doc_edges(_nodes([
        ("A", 1, 100, 100, 500, 150),
        ("B", 1, 200, 250, 400, 300),
    ]))
    r = e[e.etype == "V"].iloc[0]
    assert r.length == 100.0  # gap 250-150
    assert r.overlap == 200.0  # [200,400]
    # projection IoU: 200 / (400 + 200 - 200)
    assert r.iou == pytest.approx(200.0 / 400.0)


def test_cross_page_edges_on_iou():
    # Same box position on page 1 and 2 -> CP edge; disjoint -> none.
    e = doc_edges(_nodes([
        ("h1", 1, 100, 40, 500, 80),
        ("h2", 2, 100, 40, 500, 80),
        ("x2", 2, 600, 600, 700, 700),
    ]))
    assert _pairs(e, "CP") == {("h1", "h2")}


def test_subtract_seen_interval_algebra():
    # mirrors reference masking tests (util/masking.py:95-151)
    assert _subtract_seen(0, 10, []) == 10
    assert _subtract_seen(0, 10, [(0, 10)]) == 0
    assert _subtract_seen(0, 10, [(2, 4), (6, 8)]) == 6
    assert _subtract_seen(0, 10, [(-5, 5)]) == 5
    assert _subtract_seen(0, 10, [(5, 15)]) == 5
    assert _subtract_seen(0, 10, [(0, 5), (5, 10)]) == 0


def test_box_iou():
    assert _box_iou(0, 0, 10, 10, 0, 0, 10, 10) == 1.0
    assert _box_iou(0, 0, 10, 10, 20, 20, 30, 30) == 0.0
    assert _box_iou(0, 0, 10, 10, 5, 0, 15, 10) == pytest.approx(50 / 150)


def test_spark_edges_on_synth(spark, sf_dir):
    from transkribusdu_spark.pipeline.edges import build_edges
    from transkribusdu_spark.pipeline.parse import parse_pages
    from transkribusdu_spark.synth import pages_from_documents

    nodes = parse_pages(pages_from_documents(spark, sf_dir))
    edges = build_edges(nodes)
    pdf = edges.limit(5000).toPandas()
    assert len(pdf) > 0
    assert set(pdf.etype.unique()) <= {"V", "H", "CP"}
    # every edge endpoint must exist among the document's nodes
    n = nodes.select("url", "node_id").toPandas()
    keys = set(zip(n.url, n.node_id))
    for r in pdf.itertuples():
        assert (r.url, r.src) in keys and (r.url, r.dst) in keys


def test_los_hybrid_paths_agree_across_size_boundary():
    """The small-n list scan and the band-sweep path of _los_pass must
    emit identical tuples (all modes), including on tie-heavy grids that
    stress the sweep-order and masking rules. Sizes straddle the n=32
    dispatch boundary; equality is forced by running BOTH paths on the
    same boxes via duplication padding."""
    import numpy as np

    from transkribusdu_spark.pipeline.edges import _los_pass

    rng = np.random.default_rng(3)
    for n in (30, 31, 32, 33, 40):
        xs = rng.integers(0, 3, n) * 400.0
        ys = rng.integers(0, 500, n).astype(float)  # many sweep ties
        a1 = xs + rng.integers(0, 5, n)
        a2 = a1 + rng.integers(30, 600, n)
        b1 = ys
        b2 = ys + rng.integers(2, 120, n)
        ids = np.arange(n)
        for mode in ("g1", "g2", "g1o"):
            full = sorted(_los_pass(ids, a1, a2, b1, b2, mode))
            # same geometry through the OTHER path: force small path by
            # slicing below 32, band path by the full set — compare on
            # the shared prefix subproblem instead
            k = 20
            small = sorted(_los_pass(ids[:k], a1[:k], a2[:k], b1[:k], b2[:k], mode))
            # duplicate-pad the same k boxes with far-away dummies to push
            # the band path (n >= 32) while keeping the subgraph intact
            pad = 14
            a1p = np.concatenate([a1[:k], np.full(pad, 1e7) + np.arange(pad)])
            a2p = np.concatenate([a2[:k], np.full(pad, 1e7 + 1.0) + np.arange(pad)])
            b1p = np.concatenate([b1[:k], np.full(pad, 1e7) + np.arange(pad)])
            b2p = np.concatenate([b2[:k], np.full(pad, 1e7 + 1.0) + np.arange(pad)])
            idsp = np.arange(k + pad)
            band = sorted(
                (i, j, ln, ov, iou)
                for i, j, ln, ov, iou in _los_pass(idsp, a1p, a2p, b1p, b2p, mode)
                if i < k and j < k
            )
            assert small == band, (n, mode)
            assert len(full) >= 0  # both paths executed without error
