"""Round-6 optimization harness (bench.py is FROZEN for measurement —
this file owns the noop-sink isolation runs, per-stage probes and plan
captures the optimization round needs; cite numbers from here in
OPTIMIZATION_r06.md).

Usage:
  python bench_extra.py queries [q3_minhash_lsh ...]   # isolated noop timing
  python bench_extra.py plans <outdir>                 # explain("formatted") per query
  python bench_extra.py stages                         # sub-stage probes (q3 etc.)

Same env contract as bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_MULT / DEDUP_MULT / ANN_MULT, runs via
SPARK_GRAFT_BENCH_RUNS (default 5 here — min-of-N is the statistic on
this noisy box).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from transkribusdu_spark.ops import dedup, similarity, textstats
from transkribusdu_spark.pipeline.edges import edges_from_pages
from transkribusdu_spark.pipeline.extract import extract_from_pages
from transkribusdu_spark.relational import pricing_summary
from transkribusdu_spark.session import build_session
from transkribusdu_spark.synth import documents_amplified, write_pages

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "10"))
DEDUP_MULT = int(os.environ.get("SPARK_GRAFT_DEDUP_MULT", str(min(MULT, 20))))
ANN_MULT = int(os.environ.get("SPARK_GRAFT_ANN_MULT", str(min(MULT, 10))))
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
SNAPSHOT_PARTITIONS = 64


def _probe() -> float:
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((600, 600))
    t0 = time.perf_counter()
    for _ in range(80):
        a = np.tanh(a @ a.T / 600.0)
    return round(time.perf_counter() - t0, 4)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _build():
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    spark = build_session(app_name="bench_extra", master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 8),
                          extra_conf={"spark.local.dir": local_dir})
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _inputs(spark, tmp, need_pages=True, need_docs=True, need_emb=True):
    pages = docs = emb = None
    if need_pages:
        pages_path = os.path.join(tmp, "pages")
        write_pages(spark, SF_DIR, pages_path,
                    n_partitions=SNAPSHOT_PARTITIONS, multiplier=MULT)
        pages = spark.read.parquet(pages_path)
        pages.count()
    if need_docs:
        docs_path = os.path.join(tmp, "docs_amp")
        documents_amplified(spark, SF_DIR, DEDUP_MULT).repartition(
            SNAPSHOT_PARTITIONS).write.mode("overwrite").parquet(docs_path)
        docs = spark.read.parquet(docs_path)
        docs.count()
    if need_emb:
        emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        reps = spark.range(ANN_MULT).withColumnRenamed("id", "rep")
        emb_path = os.path.join(tmp, "emb_amp")
        (
            emb0.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x + F.col("rep").cast("float") * F.lit(0.001)
                ).alias("embedding"),
            )
            .repartition(SNAPSHOT_PARTITIONS)
            .write.mode("overwrite").parquet(emb_path)
        )
        emb = spark.read.parquet(emb_path)
        emb.count()
    return pages, docs, emb


def _query_fns(pages, docs, emb):
    return {
        "q1_extract": lambda: extract_from_pages(pages)
        .agg(F.sum(F.length("extracted_text"))).collect(),
        "q2_edges": lambda: edges_from_pages(pages)
        .groupBy("etype").count().collect(),
        "q3_minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs).count(),
        "q4_simhash_pairs": lambda: dedup.simhash_near_pairs(docs).count(),
        "q10_dup_spans": lambda: dedup.duplicate_ngram_spans(docs).count(),
        "q5_knn": lambda: similarity.knn_bruteforce(
            emb, similarity.self_queries(emb, 10), k=5).collect(),
        "q6_textstats": lambda: textstats.quality_score(docs)
        .agg(F.sum("quality")).collect(),
        "q7_pricing": lambda: pricing_summary(docs.sparkSession, SF_DIR).collect(),
        "q8_ann_lsh": lambda: similarity.ann_lsh(
            emb, similarity.self_queries(emb, 50), k=5).collect(),
        "q9_embed_neardup": lambda: dedup.embedding_near_dups(
            emb, threshold=0.85).count(),
    }


def run_queries(selected: list[str]) -> None:
    spark = _build()
    tmp = tempfile.mkdtemp(prefix="bextra_")
    try:
        need_p = not selected or any(q in ("q1_extract", "q2_edges") for q in selected)
        need_d = not selected or any(
            q in ("q3_minhash_lsh", "q4_simhash_pairs", "q6_textstats", "q10_dup_spans")
            for q in selected)
        need_e = not selected or any(
            q in ("q5_knn", "q8_ann_lsh", "q9_embed_neardup") for q in selected)
        pages, docs, emb = _inputs(spark, tmp, need_p, need_d, need_e)
        fns = _query_fns(pages, docs, emb)
        out: dict[str, dict] = {}
        p0 = _probe()
        for name, fn in fns.items():
            if selected and name not in selected:
                continue
            spark.sparkContext.setJobDescription(name)
            fn()  # warmup
            runs = []
            for _ in range(RUNS):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn()
                runs.append(round(time.monotonic() - t0, 3))
            out[name] = {"min": min(runs), "runs": runs}
            spark.sparkContext.setJobDescription(None)
        p1 = _probe()
        print(json.dumps({"queries": out, "probe_start": p0, "probe_end": p1,
                          "sf": SF_DIR, "cpus": CPUS, "runs": RUNS}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def dump_plans(outdir: str, suffix: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    spark = _build()
    tmp = tempfile.mkdtemp(prefix="bextra_plans_")
    try:
        pages, docs, emb = _inputs(spark, tmp)
        dfs = {
            "q1_extract": extract_from_pages(pages)
            .agg(F.sum(F.length("extracted_text"))),
            "q2_edges": edges_from_pages(pages).groupBy("etype").count(),
            "q3_minhash_lsh": dedup.minhash_lsh_pairs(docs),
            "q4_simhash_pairs": dedup.simhash_near_pairs(docs),
            "q10_dup_spans": dedup.duplicate_ngram_spans(docs),
            "q5_knn": similarity.knn_bruteforce(
                emb, similarity.self_queries(emb, 10), k=5),
            "q6_textstats": textstats.quality_score(docs).agg(F.sum("quality")),
            "q7_pricing": pricing_summary(spark, SF_DIR),
            "q8_ann_lsh": similarity.ann_lsh(
                emb, similarity.self_queries(emb, 50), k=5),
            "q9_embed_neardup": dedup.embedding_near_dups(emb, threshold=0.85),
        }
        for name, df in dfs.items():
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            print("wrote", name)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def run_stages() -> None:
    """Sub-stage probes for the expensive queries (noop-sink isolated)."""
    spark = _build()
    tmp = tempfile.mkdtemp(prefix="bextra_stages_")
    try:
        pages, docs, emb = _inputs(spark, tmp)
        from transkribusdu_spark.pipeline.parse import parse_pages

        stages = {
            # q1/q2 decomposition
            "parse_nodes_noop": lambda: noop(parse_pages(pages)),
            "extract_fused_noop": lambda: noop(extract_from_pages(pages)),
            "edges_fused_noop": lambda: noop(edges_from_pages(pages)),
            # q3 decomposition
            "minhash_signatures_noop": lambda: noop(dedup.minhash_signatures(docs)),
            "shingle_hash_sets_noop": lambda: noop(dedup.shingle_hash_sets(docs)),
            "minhash_full_count": lambda: dedup.minhash_lsh_pairs(docs).count(),
            # q4 decomposition
            "simhash_sig_noop": lambda: noop(dedup.simhash(docs)),
            # q10 decomposition: gram explode alone
            "q10_full": lambda: dedup.duplicate_ngram_spans(docs).count(),
            # q9 decomposition: bucket rows alone
            "q9_full": lambda: dedup.embedding_near_dups(emb, threshold=0.85).count(),
        }
        out = {}
        p0 = _probe()
        for name, fn in stages.items():
            spark.sparkContext.setJobDescription(name)
            fn()
            runs = []
            for _ in range(RUNS):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn()
                runs.append(round(time.monotonic() - t0, 3))
            out[name] = {"min": min(runs), "runs": runs}
            spark.sparkContext.setJobDescription(None)
        p1 = _probe()
        print(json.dumps({"stages": out, "probe_start": p0, "probe_end": p1}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        run_queries(sys.argv[2:])
    elif mode == "plans":
        outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r06"
        suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
        dump_plans(outdir, suffix)
    elif mode == "stages":
        run_stages()
    else:
        raise SystemExit(f"unknown mode {mode}")
