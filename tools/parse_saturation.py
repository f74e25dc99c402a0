"""Quantify single-box memory/CPU saturation of the parse kernel, no Spark.

The two-parallelism scaling evidence (tools/scaling_run.py) compares
local[4] vs local[16]; each task thread pairs with a Python worker, so
those levels keep 8 vs 32 of the box's 32 cores busy. Any throughput
ceiling of the BOX itself (DRAM bandwidth, shared LLC, host-level
steal on this firecracker VM) therefore deflates the hi level only and
reads as fake engine inefficiency.

This microbench isolates that ceiling: the SAME parse kernel
(parse_doc_cols, the hot ~100 us/doc loop of the fused q1 path) runs
in N plain multiprocessing workers with NO Spark, no Arrow, no JVM —
pure per-core Python compute over in-memory html bytes. Per-worker
throughput at N=8 vs N=32 busy cores bounds what ANY engine could
show for a 4x core ratio on this box:

    max_possible_eff(4 -> 16) = thr_per_proc(32) / thr_per_proc(8)

Output: BENCH/PARSE_SATURATION.md with per-level per-process docs/sec.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOCS_PER_PROC = int(os.environ.get("SATURATION_DOCS", "20000"))
LEVELS = tuple(int(x) for x in os.environ.get("SATURATION_LEVELS", "1,8,32").split(","))
ROUNDS = int(os.environ.get("SATURATION_ROUNDS", "3"))

_HTMLS: list[bytes] = []


def _load_htmls() -> list[bytes]:
    """Synthesize html payloads directly (same generator the pages table
    uses), no Spark session needed."""
    import pyarrow.parquet as pq

    from transkribusdu_spark.synth import render_doc

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text", "lang"]
    ).to_pandas()
    return [
        render_doc(int(d), t, lg)[2]
        for d, t, lg in zip(docs["doc_id"], docs["text"], docs["lang"])
    ]


def _init(htmls):
    global _HTMLS
    _HTMLS = htmls


def _work(n_docs: int) -> float:
    from transkribusdu_spark.pipeline.parse import parse_doc_cols

    t0 = time.monotonic()
    i = 0
    m = len(_HTMLS)
    for k in range(n_docs):
        parse_doc_cols(f"u://sat/{k}", _HTMLS[i])
        i += 1
        if i == m:
            i = 0
    return n_docs / (time.monotonic() - t0)


def main() -> None:
    htmls = _load_htmls()
    print(f"{len(htmls)} html payloads, {DOCS_PER_PROC} parses/proc", flush=True)
    results: dict[int, list[float]] = {n: [] for n in LEVELS}
    for r in range(ROUNDS):
        for n in LEVELS:
            with mp.Pool(n, initializer=_init, initargs=(htmls,)) as pool:
                per_proc = pool.map(_work, [DOCS_PER_PROC] * n)
            results[n].append(statistics.median(per_proc))
            print(f"round {r} n={n}: median {results[n][-1]:.0f} docs/s/proc", flush=True)

    med = {n: statistics.median(v) for n, v in results.items()}
    lines = [
        "# Parse-kernel saturation, no Spark (per-core ceiling of this box)",
        "",
        f"`parse_doc_cols` over in-memory synthetic html ({DOCS_PER_PROC} docs "
        f"per process, median of {ROUNDS} rounds), plain multiprocessing — no "
        "JVM, no Arrow, no shuffle. Per-process throughput vs busy cores:",
        "",
        "| busy cores (procs) | docs/sec/proc (median) | vs 1-proc |",
        "|---|---|---|",
    ]
    base = med[LEVELS[0]]
    for n in LEVELS:
        lines.append(f"| {n} | {med[n]:.0f} | {med[n] / base:.3f} |")
    if 8 in med and 32 in med:
        ceil = med[32] / med[8]
        lines += [
            "",
            f"**Box ceiling for the 4->16 task-thread comparison: "
            f"{ceil:.3f}** — local[4]/local[16] busy 8/32 cores, so even a "
            "perfectly-scheduled engine cannot exceed this pair ratio on this "
            "box; the gap to 1.0 is hardware (DRAM bandwidth / LLC / host "
            "steal), not engine overhead. A real cluster adds memory busses "
            "with its executors, so this ceiling does not transfer to the "
            "north rule's actual two-cluster-size criterion.",
        ]
    lines += ["", "```json", json.dumps(med), "```", ""]
    with open(os.path.join(REPO, "BENCH", "PARSE_SATURATION.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(med))


if __name__ == "__main__":
    main()
