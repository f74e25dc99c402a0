"""Two-parallelism scaling evidence (BASELINE.md protocol).

No real cluster exists in this sandbox, so the north rule's N vs 4N
executor criterion is evidenced by running the identical bench job at
local[8] and local[32] on the same input snapshot; efficiency =
throughput(4N) / (4 * throughput(N)). Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import platform

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SCALING_RUNS", "3"))
MULT = os.environ.get("SPARK_GRAFT_BENCH_MULT", "10")
# N and 4N parallelism levels. Default 4/16, not 8/32: every local[k]
# task thread pairs with a Python worker process, so level 4N must keep
# (k JVM threads + k Python workers) <= physical cores or the measurement
# is machine-saturation, not scaling. 16+16 = 32 cores exactly.
LEVELS = tuple(int(x) for x in os.environ.get("SCALING_LEVELS", "4,16").split(","))
# Snapshot partition count. Default 192: divisible by both default
# levels (48 waves at local[4], 12 at local[16]) so per-wave tail loss
# stays small at the HIGH level — 64 partitions gave local[16] only 4
# waves, where one slow partition idles 15 cores for a quarter of the
# job and reads as fake scaling loss.
PARTITIONS = int(os.environ.get("SCALING_PARTITIONS", "192"))
# The interleaved-pair schedule is defined for exactly two levels (lo, hi);
# silently running only the endpoints of a longer list would discard the
# middle levels' data, so reject that configuration outright.
if len(LEVELS) != 2:
    raise SystemExit(
        f"SCALING_LEVELS must name exactly two parallelism levels (lo,hi); "
        f"got {LEVELS!r} — the interleaved-pair protocol has no schedule for "
        f"intermediate levels"
    )
# The efficiency statistic divides by each level's extract_docs_per_sec,
# which bench.py reports as 0.0 when q1_extract is excluded — fail fast
# instead of ZeroDividing after half an hour of pairs.
_q_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
if _q_env and "q1_extract" not in {q.strip() for q in _q_env.split(",")}:
    raise SystemExit(
        "SPARK_GRAFT_BENCH_QUERIES must include q1_extract: the scaling "
        f"efficiency is computed from extraction throughput (got {_q_env!r})"
    )


def _write_snapshot(pages_dir: str) -> None:
    """Write the shared input snapshot ONCE so both parallelism levels
    read byte-identical, identically-partitioned input."""
    code = (
        "import sys; sys.path.insert(0, %r);"
        "from transkribusdu_spark.session import build_session;"
        "from transkribusdu_spark.synth import write_pages;"
        "s = build_session(master='local[32]');"
        "s.sparkContext.setLogLevel('ERROR');"
        "write_pages(s, %r, %r, n_partitions=%s, multiplier=%s);"
        "s.stop()" % (REPO, SF_DIR, pages_dir, PARTITIONS, MULT)
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1800)


def bench(cpus: int, pages_dir: str) -> dict:
    # One timed run per bench invocation, no inner idle-wait: the OUTER
    # interleaved pairs supply the spread, and the idle gate runs once
    # per PAIR (below) so lo and hi land inside the same noise epoch.
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_GRAFT_PAGES_DIR=pages_dir, SPARK_GRAFT_BENCH_MULT=MULT,
               SPARK_GRAFT_BENCH_RUNS=os.environ.get("SCALING_INNER_RUNS", "1"),
               SPARK_GRAFT_BENCH_WAIT_S="0")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    import tempfile

    snap = tempfile.mkdtemp(prefix="scaling_pages_")
    pages_dir = os.path.join(snap, "pages")
    _write_snapshot(pages_dir)
    # INTERLEAVED pairs (lo, hi, lo, hi, ...): this sandbox's host has
    # noisy-neighbor epochs that move absolute throughput by +-30% with
    # zero local load (measured; CPU busy < 5% at every run start), so
    # the N-vs-4N ratio is only meaningful between TEMPORALLY ADJACENT
    # runs. Efficiency = median over per-pair ratios, each pair inside
    # one noise epoch; the old level-sequential layout paired a slow
    # epoch's lo against a fast epoch's hi (or vice versa) and produced
    # efficiency "measurements" from 0.58 to 1.14 for identical code.
    results: dict[int, list[dict]] = {c: [] for c in LEVELS}
    pair_busy: list[float] = []
    lo, hi = LEVELS
    # Pair-level idle gate (same /proc/stat signal bench.py uses): wait
    # for the machine to be quiet BEFORE each pair so both levels of the
    # pair run inside one noise epoch; the recorded busy fraction lets a
    # reader discount any pair that started hot anyway.
    sys.path.insert(0, REPO)
    import bench as bench_mod

    for i in range(RUNS):
        pair_busy.append(bench_mod._wait_for_idle())
        for cpus in (lo, hi):
            r = bench(cpus, pages_dir)
            results[cpus].append(r)
            print(f"pair {i} local[{cpus}] (busy {pair_busy[-1]:.2f}): "
                  + json.dumps(r))

    def med(cpus: int, key: str) -> float:
        return statistics.median(r[key] for r in results[cpus])

    ratio = hi // lo
    t_lo = med(lo, "extract_docs_per_sec")
    t_hi = med(hi, "extract_docs_per_sec")
    pair_effs = [
        results[hi][i]["extract_docs_per_sec"]
        / (ratio * results[lo][i]["extract_docs_per_sec"])
        for i in range(RUNS)
    ]
    eff = statistics.median(pair_effs)
    eff_min = min(pair_effs)
    ncpu = os.cpu_count()
    mem_gib = round(os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30)
    docs = results[hi][0]["docs"]

    lines = [
        "# BENCH — measured throughput & scaling efficiency",
        "",
        f"Machine: {platform.machine()} Linux, {ncpu} cores, {mem_gib} GiB RAM; "
        f"single JVM, `local[k]` stands in for k executors (no real cluster in "
        f"this sandbox — see BASELINE.md). Levels local[{lo}] vs local[{hi}]: "
        f"each task thread pairs with a Python worker process, so the levels "
        f"keep {2 * lo} vs {2 * hi} of {ncpu} hardware threads busy. When the "
        f"high level saturates the box, the pair ratio INCLUDES the box's own "
        f"per-core throughput falloff (DRAM/LLC/host-steal) — quantified "
        f"engine-free in BENCH/PARSE_SATURATION.md; divide by that ceiling to "
        f"read the engine-attributable efficiency.",
        f"Input snapshot: pages table synthesized from `{SF_DIR}` "
        f"({docs} documents), written to parquet before timing (identical bytes "
        f"and partitioning for both levels); {RUNS} INTERLEAVED run pairs "
        f"(local[{lo}] then local[{hi}], repeated) with steady-state timings — "
        f"this host shows +-30% noisy-neighbor throughput epochs with zero "
        f"local load, so efficiency is computed per temporally-adjacent pair "
        f"and the MEDIAN of pair ratios is reported (a level-sequential "
        f"layout pairs across noise epochs and is meaningless here).",
        "",
        "| parallelism | extraction docs/sec (median) | headline suite sec (median) |",
        "|---|---|---|",
        f"| local[{lo}] (N) | {t_lo:.2f} | {med(lo, 'value'):.2f} |",
        f"| local[{hi}] ({ratio}N) | {t_hi:.2f} | {med(hi, 'value'):.2f} |",
        "",
        f"**Scaling efficiency (extraction): median of per-pair ratios = "
        f"{eff:.3f}**  (target >= 0.8; pair ratios: "
        + ", ".join(f"{e:.3f}" for e in pair_effs) + ")",
        "",
        f"Conservative bound (worst adjacent pair): {eff_min:.3f}. Values "
        f"above 1.0 are residual intra-pair noise, not true "
        f"super-linearity.",
        "",
        f"Pre-pair CPU busy fractions (idle gate, /proc/stat): "
        + ", ".join(f"{b:.2f}" for b in pair_busy)
        + " — each pair started only after the machine measured quiet, so "
        "both levels of a pair share one noise epoch.",
        "",
        "## Deployment-surface corroboration",
        "",
        "The same two-level protocol run through the literal launch surface "
        "the north rule names — `spark-submit --py-files "
        "transkribusdu_spark.zip jobs/extract_job.py`, full job including "
        "output parquet + lineage writes — is in BENCH/SUBMIT_SCALING.md "
        "(`tools/submit_scaling_run.py`), with per-phase timings attributing "
        "the whole-job-vs-compute-only gap to fixed-cost dilution on a "
        "sub-minute job, driver-serial output commit, and single-disk "
        "writeback — single-box terms that, like the DRAM ceiling above, do "
        "not transfer to a real multi-node cluster. An unsaturated-levels "
        "variant (BENCH/SUBMIT_SCALING_UNSATURATED.md) measures the same "
        "full job at parallelism the box can absorb, isolating engine "
        "scaling from machine saturation.",
        "",
        "Per-query medians (seconds):",
        "",
        f"| query | local[{lo}] | local[{hi}] |",
        "|---|---|---|",
    ]
    qnames = results[lo][0]["queries"].keys()
    for q in qnames:
        m_lo = statistics.median(r["queries"][q] for r in results[lo])
        m_hi = statistics.median(r["queries"][q] for r in results[hi])
        lines.append(f"| {q} | {m_lo:.2f} | {m_hi:.2f} |")
    lines += [
        "",
        "Raw runs:",
        "```json",
        *[json.dumps(r) for c in LEVELS for r in results[c]],
        "```",
        "",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"efficiency={eff:.3f} -> BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
