"""spark-submit entrypoint for END-TO-END training-corpus construction:
the full funnel a web-scale data pipeline runs over a crawl snapshot,
in one job.

    pages (url, warc_ts, html, ...)
      -> URL snapshot dedup          (ops/urls.url_dedup_rows: keep the
                                      latest snapshot per canonical url)
      -> main-content extraction     (pipeline/extract.extract_from_pages:
                                      fused map-only parse+extract)
      -> content dedup               (ops/dedup.minhash_lsh_pairs ->
                                      ops/dedupgraph survivors: one doc
                                      kept per near-dup cluster)
      -> quality/lang annotation     (ops/textstats: token counts,
                                      language id, quality score,
                                      repetition stats — optional)
      -> lineage'd corpus write      (pipeline/lineage.run_with_lineage:
                                      per-partition lineage + checksums)

Deployment shape matches jobs/extract_job.py (`spark-submit --py-files
transkribusdu_spark.zip jobs/corpus_job.py ...`); the single JSON line
on stdout carries the stage funnel (rows in/out per stage), per-phase
wall seconds, and the lineage verdict. Sandbox stand-in::

    spark-submit --master local[8] --py-files dist/transkribusdu_spark.zip \
        jobs/corpus_job.py --sf-dir /root/testdata/sf0.001 --output /tmp/corpus

This job is a SNAPSHOT job, deliberately without extract_job's
--resume: content dedup is corpus-global (survivor choice depends on
every other document in the snapshot), so an incremental restart over
"pending urls only" could not reproduce the same clusters — a retry
reruns the snapshot under a fresh run id instead. extract_job remains
the resumable per-url surface.
"""

from __future__ import annotations

import argparse
import json
import time
import uuid


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet dir of the pages table "
                     "(url, warc_ts, html, text, lang)")
    src.add_argument("--sf-dir", help="testdata sf dir: synthesize the pages "
                     "table from its documents.parquet (sandbox runs)")
    p.add_argument("--output", required=True,
                   help="output dir: extracted/ + lineage/ parquet tables")
    p.add_argument("--run-id", default=None)
    p.add_argument("--input-snapshot", default=None,
                   help="snapshot id recorded on lineage rows")
    p.add_argument("--threshold", type=float, default=None,
                   help="near-dup jaccard threshold (engine default if unset)")
    p.add_argument("--no-url-dedup", action="store_true",
                   help="skip the URL snapshot dedup stage")
    p.add_argument("--no-content-dedup", action="store_true",
                   help="skip the near-dup cluster/survivor stage")
    p.add_argument("--annotate", action="store_true",
                   help="attach token/lang/quality/repetition columns")
    p.add_argument("--repartition", type=int, default=0,
                   help="hash-repartition on url before extraction")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from transkribusdu_spark.ops import dedup, dedupgraph, textstats, urls
    from transkribusdu_spark.pipeline.extract import extract_from_pages
    from transkribusdu_spark.pipeline.lineage import (
        run_with_lineage,
        straggler_stats,
        verify_lineage,
    )
    from transkribusdu_spark.session import submit_session
    from transkribusdu_spark.synth import pages_from_documents

    run_id = args.run_id or f"corpus-{uuid.uuid4().hex[:12]}"
    spark = submit_session(app_name=f"corpus_job:{run_id}")
    t0 = time.monotonic()
    funnel: dict[str, int] = {}
    phases: dict[str, float] = {}

    if args.pages:
        pages = spark.read.parquet(args.pages)
        snapshot = args.input_snapshot or args.pages
    else:
        pages = pages_from_documents(spark, args.sf_dir)
        snapshot = args.input_snapshot or f"synth:{args.sf_dir}"
    # The raw pages table has THREE consumers before extraction
    # materializes (pages_in count, after_url_dedup count, the
    # extraction scan itself); persist it so funnel bookkeeping does not
    # triple the input I/O at snapshot scale — released right after the
    # extracted stage is materialized below.
    raw_pages = pages.persist()
    funnel["pages_in"] = pages.count()

    t = time.monotonic()
    if not args.no_url_dedup:
        pages = urls.url_dedup_rows(pages).drop("canonical_url", "n_snapshots")
        funnel["after_url_dedup"] = pages.count()
    phases["url_dedup_sec"] = round(time.monotonic() - t, 3)

    if args.repartition:
        pages = pages.repartition(args.repartition, F.col("url"))

    # Extraction feeds two consumers (the dedup pair scan and the final
    # write), so materialize it once — at cluster scale this is the
    # checkpoint-after-expensive-parse shape, never a double parse.
    t = time.monotonic()
    extracted = extract_from_pages(pages)
    extracted.persist()
    funnel["extracted"] = extracted.count()
    raw_pages.unpersist()  # last pages consumer has materialized
    phases["extract_sec"] = round(time.monotonic() - t, 3)

    t = time.monotonic()
    if not args.no_content_dedup:
        docs = extracted.select("doc_id", F.col("extracted_text").alias("text"))
        kw = {} if args.threshold is None else {"threshold": args.threshold}
        pairs = dedup.minhash_lsh_pairs(docs, **kw)
        verdicts = dedupgraph.dedup_survivors(docs, pairs)
        extracted = extracted.join(
            verdicts.filter("survivor").select("doc_id"), "doc_id", "left_semi"
        )
        funnel["after_content_dedup"] = extracted.count()
    phases["content_dedup_sec"] = round(time.monotonic() - t, 3)

    t = time.monotonic()
    if args.annotate:
        docs = extracted.select("doc_id", F.col("extracted_text").alias("text"))
        ann = (
            textstats.token_count(docs)
            .join(textstats.language_id(docs), "doc_id")
            .join(textstats.quality_score(docs).drop("n_tokens"), "doc_id")
            .join(textstats.repetition_stats(docs), "doc_id")
        )
        extracted = extracted.join(ann, "doc_id")
    phases["annotate_sec"] = round(time.monotonic() - t, 3)

    phases.update(run_with_lineage(extracted, args.output, run_id=run_id,
                                   input_snapshot=snapshot))
    wall = time.monotonic() - t0
    out_docs = funnel.get("after_content_dedup", funnel["extracted"])

    metrics = {
        "run_id": run_id,
        "input_snapshot": snapshot,
        "funnel": funnel,
        "corpus_docs": int(out_docs),
        "wall_sec": round(wall, 3),
        "phases": phases,
        "docs_per_sec": round(funnel["pages_in"] / wall, 2) if wall > 0 else 0.0,
        "stragglers": straggler_stats(spark, args.output, run_id=run_id),
        "lineage": verify_lineage(spark, args.output, expected_docs=out_docs),
        "master": spark.sparkContext.master,
    }
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
