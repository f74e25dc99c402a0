"""The north rule's launch surface, end-to-end: `spark-submit
--py-files transkribusdu_spark.zip jobs/extract_job.py`.

The job script is copied into a temp dir and launched with a scrubbed
PYTHONPATH from OUTSIDE the repo, so the package can resolve ONLY from
the --py-files zip — this is the actual cluster deployment path, not an
import-from-checkout simulation. Asserts the three job contracts:
byte-identical extraction, complete per-partition lineage, and an
idempotent --resume restart."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"
SPARK_SUBMIT = shutil.which("spark-submit")


def _submit(tmp, zip_path, *job_args):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zip_path,
            os.path.join(tmp, "extract_job.py"),
            *job_args,
        ],
        cwd=tmp,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    metrics = [
        json.loads(l) for l in proc.stdout.splitlines()
        if l.startswith("{") and '"run_id"' in l
    ]
    assert len(metrics) == 1, proc.stdout[-2000:]
    return metrics[0]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_submit_extract_resume_lineage(tmp_path):
    tmp = str(tmp_path)
    out = os.path.join(tmp, "out")
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
         os.path.join(tmp, "transkribusdu_spark.zip")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    shutil.copy(os.path.join(REPO, "jobs", "extract_job.py"), tmp)

    m1 = _submit(
        tmp, zip_path, "--sf-dir", SF_DIR, "--output", out,
        "--run-id", "rA", "--expected-docs", "500",
    )
    assert m1["docs_this_run"] == 500
    assert m1["lineage"]["complete"] is True
    assert m1["lineage"]["lineage_docs"] == 500
    assert m1["stragglers"]["partitions"] >= 1
    assert m1["master"] == "local[4]"  # spark-submit's --master won

    # Byte-identical extraction against the source documents table.
    con = duckdb.connect()
    n_bad = con.execute(
        f"""
        select count(*) from '{out}/extracted/*.parquet' e
        join '{SF_DIR}/documents.parquet' d using (doc_id)
        where e.extracted_text is distinct from d.text
        """
    ).fetchone()[0]
    assert n_bad == 0

    # Idempotent restart: everything already extracted -> zero new docs,
    # no duplicate output rows, and run rA's lineage is untouched.
    m2 = _submit(
        tmp, zip_path, "--sf-dir", SF_DIR, "--output", out,
        "--run-id", "rB", "--resume", "--expected-docs", "500",
    )
    assert m2["docs_this_run"] == 0
    assert m2["lineage"]["complete"] is True
    n_rows, n_urls = con.execute(
        f"select count(*), count(distinct url) from '{out}/extracted/*.parquet'"
    ).fetchone()
    assert n_rows == n_urls == 500
