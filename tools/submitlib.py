"""Shared spark-submit launch harness.

One copy of the deployment recipe — zip build, scrubbed environment,
--py-files wiring, metrics-line extraction — imported by both the
deployment test (tests/test_spark_submit.py) and the scaling runner
(tools/submit_scaling_run.py) so the two cannot drift.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def build_zip(dest: str) -> str:
    """Build the --py-files package zip at ``dest`` (subprocess, so the
    caller's interpreter never imports the package it is shipping)."""
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"), dest],
        capture_output=True, text=True, check=True,
    ).stdout.strip()


def scrubbed_env() -> dict[str, str]:
    """Environment for a deployment-shaped launch: no PYTHONPATH (imports
    must resolve from the zip), current interpreter pinned for both the
    driver and the workers."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    return env


def run_submit(
    job_path: str,
    job_args: list[str],
    *,
    master: str,
    zip_path: str,
    cwd: str,
    conf: dict[str, str] | None = None,
    timeout: int = 1800,
) -> dict:
    """Launch ``spark-submit --master <master> --py-files <zip> <job>``
    and return the job's single JSON metrics line (a dict). Raises
    RuntimeError with the tail of stderr on a nonzero exit."""
    cmd = [SPARK_SUBMIT, "--master", master]
    for k, v in (conf or {}).items():
        cmd += ["--conf", f"{k}={v}"]
    cmd += ["--py-files", zip_path, job_path, *job_args]
    proc = subprocess.run(
        cmd, cwd=cwd, env=scrubbed_env(), capture_output=True, text=True,
        timeout=timeout,
    )
    if proc.returncode != 0:
        # The Python driver's traceback lands on spark-submit's STDOUT
        # (PythonRunner forwards the app's streams there), while stderr
        # carries log4j INFO/WARN chatter — surface both, noise-stripped.
        import re

        noise = re.compile(r"^\d\d/\d\d/\d\d \d\d:\d\d:\d\d (INFO|WARN) ")
        signal = [
            l
            for stream in (proc.stdout, proc.stderr)
            for l in stream.splitlines()
            if not noise.match(l)
        ]
        detail = "\n".join(signal[-60:]) or proc.stderr[-4000:]
        raise RuntimeError(f"spark-submit failed:\n{detail}")
    metrics = [
        json.loads(l) for l in proc.stdout.splitlines()
        if l.startswith("{") and '"run_id"' in l
    ]
    if len(metrics) != 1:
        raise RuntimeError(
            f"expected exactly one metrics line, got {len(metrics)}:\n"
            + proc.stdout[-2000:]
        )
    return metrics[0]
