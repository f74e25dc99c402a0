"""Occupancy-aware LSH config evidence at >= 1M vectors (round-4 verdict #8).

The contract/bench call sites pin ``n_vectors=None`` so oracle configs
stay stable; this script exercises the N-aware rule END-TO-END at a
vector count past the deepening trigger (N / 2^P > 8192 at the 0.85
threshold means N > 1.05M for the pinned 7-plane config) and records
recall + wall for BOTH configs into BENCH/NEARDUP_SCALE.md:

- pinned   (24 tables, 7 planes): what the rule gives with n_vectors=None
- deepened (30 tables, 8 planes): what it gives at n_vectors=1.2M

Input: 1.2M deterministic pseudo-random unit vectors (dim 64, seeded
per contiguous id range — no RNG in Spark plans, reproducible across
runs) plus 1000 PLANTED near-dup pairs at cosine ~0.92: vector N+i is
vector i with deterministic noise. Recall = planted pairs found /
planted pairs whose exact cosine >= threshold (exact cosines are
computed locally in numpy, so the denominator is ground truth, not a
construction guess). Random 64-d pairs essentially never reach 0.85,
so output ~= planted set and the run measures candidate-volume FLOPs,
which is precisely what the occupancy rule exists to bound.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BASE = int(os.environ.get("NEARDUP_SCALE_N", "1200000"))
N_PLANT = 1000
DIM = 64
THRESHOLD = 0.85
# Planted noise scale 0.55 (hardcoded in gen() AND the ground-truth
# loop, which must stay in lockstep): expected cosine 1/sqrt(1+0.55^2)
# ~ 0.876, with dim-64 sampling spread the measured planted cosines sit
# around ~0.9 (above the 0.85 threshold, below trivially-easy).


def main() -> None:
    from pyspark.sql import functions as F

    from transkribusdu_spark.ops.similarity import lsh_bucket_verified_pairs, neardup_config
    from transkribusdu_spark.session import build_session

    spark = build_session(app_name="neardup_scale", master="local[32]",
                          shuffle_partitions=64,
                          extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
    spark.sparkContext.setLogLevel("ERROR")

    # --- deterministic input ------------------------------------------------
    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM), dtype=np.float64)
            for j, i in enumerate(ids):
                base = int(i) if i < N_BASE else int(i) - N_BASE
                rng = np.random.default_rng(base + 7)
                v = rng.standard_normal(DIM)
                if i >= N_BASE:  # planted companion: same seed + seeded noise
                    nrng = np.random.default_rng(base + 900_000_007)
                    v = v + 0.55 * nrng.standard_normal(DIM)
                out[j] = v / np.linalg.norm(v)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(out)})

    n_total = N_BASE + N_PLANT
    ids = spark.range(0, N_BASE).union(
        spark.range(N_BASE, N_BASE + N_PLANT)
    ).repartition(64)
    emb_path = "/dev/shm/neardup_scale_emb"
    (ids.mapInPandas(gen, "vec_id long, embedding array<double>")
        .write.mode("overwrite").parquet(emb_path))
    emb = spark.read.parquet(emb_path)
    assert emb.count() == n_total

    # ground-truth planted cosines (local numpy — the generator is
    # deterministic, so this exactly reproduces the executor vectors)
    true_pairs = 0
    for i in range(N_PLANT):
        rng = np.random.default_rng(i + 7)
        v = rng.standard_normal(DIM)
        nrng = np.random.default_rng(i + 900_000_007)
        w = v + 0.55 * nrng.standard_normal(DIM)
        c = float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
        if round(c, 6) >= THRESHOLD:
            true_pairs += 1

    results = {}
    for label, n_vec in (("pinned", None), ("occupancy-aware", n_total)):
        tables, planes = neardup_config(THRESHOLD, n_vectors=n_vec)
        t0 = time.monotonic()
        pairs = lsh_bucket_verified_pairs(emb, THRESHOLD, tables, planes)
        # ONE pass: planted count and total count in the same aggregate
        # (two separate counts would run the whole verify DAG twice and
        # double the measured wall).
        row = pairs.agg(
            F.count("*").alias("total"),
            F.sum(
                (
                    (F.col("vec_b") - F.col("vec_a") == N_BASE)
                    | (F.col("vec_a") - F.col("vec_b") == N_BASE)
                ).cast("long")
            ).alias("planted"),
        ).collect()[0]
        found, total_found = int(row["planted"] or 0), int(row["total"])
        wall = time.monotonic() - t0
        results[label] = {
            "tables": tables, "planes": planes,
            "expected_occupancy": round(n_total / (1 << planes)),
            "wall_sec": round(wall, 1),
            "planted_found": found, "planted_true": true_pairs,
            "recall": round(found / max(true_pairs, 1), 4),
            "pairs_total": total_found,
        }
        print(label, json.dumps(results[label]), flush=True)

    lines = [
        "# Occupancy-aware near-dup config at 1.2M vectors",
        "",
        f"Input: {n_total} deterministic unit vectors (dim {DIM}), "
        f"{N_PLANT} planted near-dup pairs (cosine ~0.92, ground truth "
        f"{true_pairs} at threshold {THRESHOLD}); local[32], one run per "
        f"config (multi-minute jobs — scheduling noise is negligible).",
        "",
        "| config | tables x planes | E[bucket occupancy] | wall (s) | planted recall |",
        "|---|---|---|---|---|",
    ]
    for label, r in results.items():
        lines.append(
            f"| {label} | {r['tables']} x {r['planes']} | {r['expected_occupancy']} "
            f"| {r['wall_sec']} | {r['recall']} ({r['planted_found']}/{r['planted_true']}) |"
        )
    sp = results["pinned"]["wall_sec"] / max(results["occupancy-aware"]["wall_sec"], 1e-9)
    r_pin = results["pinned"]["recall"]
    r_dp = results["occupancy-aware"]["recall"]
    recall_txt = (
        f"at equal recall ({r_pin})" if r_pin == r_dp
        else f"at recall {r_dp} vs {r_pin} pinned"  # state the trade honestly
    )
    lines += [
        "",
        f"Deepened config speedup: **{sp:.2f}x** {recall_txt} — "
        "the N-aware rule halves expected bucket occupancy (verify FLOPs ~ "
        "occupancy^2 per bucket) and re-solves the table count so the "
        "analytic per-pair miss stays <= 1e-3.",
        "",
        "```json",
        json.dumps(results, indent=2),
        "```",
        "",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "NEARDUP_SCALE.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH/NEARDUP_SCALE.md")
    spark.stop()


if __name__ == "__main__":
    main()
