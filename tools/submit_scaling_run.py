"""Two-parallelism scaling evidence through the LITERAL launch surface
the north rule names: `spark-submit --py-files transkribusdu_spark.zip
jobs/extract_job.py` at N and 4N parallelism.

Same interleaved-pair protocol as tools/scaling_run.py (shared
pre-written snapshot, per-pair /proc/stat idle gate, median of
temporally-adjacent pair ratios) — but each timed run is a separate
`spark-submit` process importing the package ONLY from the --py-files
zip, and the measured job includes the full production surface: scan ->
fused extract -> parquet write -> per-partition lineage. Throughput is
the job's own docs_per_sec metric. Writes BENCH/SUBMIT_SCALING.md.

    SCALING_RUNS=3 SPARK_GRAFT_BENCH_MULT=400 python tools/submit_scaling_run.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SCALING_RUNS", "3"))
MULT = os.environ.get("SPARK_GRAFT_BENCH_MULT", "400")
LEVELS = tuple(int(x) for x in os.environ.get("SCALING_LEVELS", "4,16").split(","))
PARTITIONS = int(os.environ.get("SCALING_PARTITIONS", "192"))
if len(LEVELS) != 2:
    raise SystemExit(f"SCALING_LEVELS must name exactly two levels; got {LEVELS!r}")

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _write_snapshot(pages_dir: str) -> None:
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


def submit(cpus: int, zip_path: str, job_path: str, pages_dir: str,
           work: str) -> dict:
    out_dir = os.path.join(work, f"out_{cpus}")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", f"local[{cpus}]",
            "--conf", "spark.driver.memory=8g",
            "--py-files", zip_path,
            job_path,
            "--pages", pages_dir,
            "--output", out_dir,
            "--run-id", f"scale-{cpus}",
            "--no-overflow-audit",  # time ONE pass of the corpus per run
        ],
        cwd=work, env=env, capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        raise SystemExit(proc.stderr[-4000:])
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    shutil.rmtree(out_dir)  # fresh output per run: no resume short-circuit
    return json.loads(line)


def main() -> None:
    work = tempfile.mkdtemp(prefix="submit_scaling_")
    pages_dir = os.path.join(work, "pages")
    _write_snapshot(pages_dir)
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
         os.path.join(work, "transkribusdu_spark.zip")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    job_path = os.path.join(work, "extract_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "extract_job.py"), job_path)

    sys.path.insert(0, REPO)
    import bench as bench_mod

    lo, hi = LEVELS
    results: dict[int, list[dict]] = {c: [] for c in LEVELS}
    pair_busy: list[float] = []
    for i in range(RUNS):
        pair_busy.append(bench_mod._wait_for_idle())
        for cpus in (lo, hi):
            r = submit(cpus, zip_path, job_path, pages_dir, work)
            results[cpus].append(r)
            print(f"pair {i} local[{cpus}] (busy {pair_busy[-1]:.2f}): "
                  + json.dumps(r))

    ratio = hi // lo
    pair_effs = [
        results[hi][i]["docs_per_sec"] / (ratio * results[lo][i]["docs_per_sec"])
        for i in range(RUNS)
    ]
    # Phase-level attribution: the extract+write phase is the scaling
    # surface (map-only, file-parallel); the lineage checksum pass and
    # driver-side setup are small near-fixed costs whose share of the
    # wall grows as the job gets faster — report both so a reader can
    # tell noise, fixed-cost dilution, and true scaling loss apart.
    def phase_eff(i: int) -> float:
        lo_r = results[lo][i]["docs_this_run"] / results[lo][i]["phases"]["extract_write_sec"]
        hi_r = results[hi][i]["docs_this_run"] / results[hi][i]["phases"]["extract_write_sec"]
        return hi_r / (ratio * lo_r)

    phase_effs = [phase_eff(i) for i in range(RUNS)]
    eff = statistics.median(pair_effs)
    med_lo = statistics.median(r["docs_per_sec"] for r in results[lo])
    med_hi = statistics.median(r["docs_per_sec"] for r in results[hi])
    docs = results[hi][0]["docs_this_run"]

    lines = [
        "# Scaling evidence through the literal spark-submit surface",
        "",
        f"Same interleaved-pair protocol as BASELINE.md, but each timed run is "
        f"a separate `spark-submit --master local[k] --py-files "
        f"transkribusdu_spark.zip jobs/extract_job.py` process (package "
        f"importable ONLY from the zip; scrubbed PYTHONPATH), and the measured "
        f"job is the full production path: snapshot scan -> fused "
        f"parse+extract -> parquet write -> per-partition lineage rows. "
        f"Throughput below is the job's own `docs_per_sec` metric, which "
        f"includes the output + lineage writes (it is therefore NOT comparable "
        f"to BASELINE.md's compute-only numbers — it exists to show the "
        f"deployment surface itself scales, not to restate peak throughput).",
        "",
        f"Input: {docs} documents ({PARTITIONS}-file snapshot from `{SF_DIR}`, "
        f"mult={MULT}), written once and read by both levels; {RUNS} "
        f"interleaved pairs; pre-pair CPU busy fractions: "
        + ", ".join(f"{b:.2f}" for b in pair_busy) + ".",
        "",
        "| parallelism | job docs/sec (median) |",
        "|---|---|",
        f"| local[{lo}] (N) | {med_lo:.2f} |",
        f"| local[{hi}] ({ratio}N) | {med_hi:.2f} |",
        "",
        f"**Scaling efficiency, whole job: median of per-pair ratios = "
        f"{eff:.3f}** (pair ratios: "
        + ", ".join(f"{e:.3f}" for e in pair_effs) + "; worst pair "
        f"{min(pair_effs):.3f}). **Extract+write phase only: median "
        f"{statistics.median(phase_effs):.3f}** (pair ratios: "
        + ", ".join(f"{e:.3f}" for e in phase_effs) + ") — the phase split "
        f"in each raw line separates the map-only scaling surface from the "
        f"near-fixed lineage/setup costs, whose share of the wall grows as "
        f"the job gets faster (fixed-cost dilution, not scaling loss). "
        f"Values above 1.0 are intra-pair noise. The single-box occupancy "
        f"ceiling quantified in BENCH/PARSE_SATURATION.md applies here "
        f"identically.",
        "",
        "Raw metrics lines:",
        "```json",
    ]
    for cpus in (lo, hi):
        for r in results[cpus]:
            lines.append(json.dumps({"cpus": cpus, **r}))
    lines += ["```", ""]
    out_md = os.path.join(REPO, "BENCH", "SUBMIT_SCALING.md")
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}: eff median {eff:.3f}, pairs "
          + ", ".join(f"{e:.3f}" for e in pair_effs))
    shutil.rmtree(work)


if __name__ == "__main__":
    main()
