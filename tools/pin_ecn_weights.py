"""Pin trained ECN weights as a JSON artifact per sf dir.

The correctness-gate query `ecn_scores` used to run its deterministic
30-epoch distributed fit inline (~30 Spark jobs per gate run); this tool
runs the identical fit once and freezes the weights under
truth/ecn_weights_<sf>.json, which the query then loads and scores with.
The fit is bit-deterministic (integer-rounded gradient aggregation), so
pinning changes nothing about the scores — only the gate's wall time.

Usage: python tools/pin_ecn_weights.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transkribusdu_spark.pipeline.ecn import train_ecn
from transkribusdu_spark.pipeline.edges import build_edges
from transkribusdu_spark.pipeline.features import NODE_FEATURE_COLS, node_features
from transkribusdu_spark.pipeline.parse import parse_pages
from transkribusdu_spark.session import build_session
from transkribusdu_spark.synth import pages_from_documents

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = build_session(master="local[16]", app_name="pin_ecn_weights")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        nodes = parse_pages(pages_from_documents(spark, sf_dir)).cache()
        edges = build_edges(nodes).cache()
        nf = node_features(nodes, edges).cache()
        w = train_ecn(nf, edges, NODE_FEATURE_COLS, epochs=30, lr=0.1)
        sf_tag = os.path.basename(sf_dir.rstrip("/"))
        out = os.path.join(REPO, "truth", f"ecn_weights_{sf_tag}.json")
        with open(out, "w") as fh:
            json.dump(w, fh)
        print(f"wrote {out}")
        nodes.unpersist(); edges.unpersist(); nf.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
