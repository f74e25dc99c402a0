"""Corpus amplification for dedup benchmarks: Jaccard structure must be
exactly preserved within replicas and zero across replicas."""

from pyspark.sql import functions as F

from transkribusdu_spark.ops import dedup
from transkribusdu_spark.synth import documents_amplified


def test_amplified_preserves_pair_structure(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    amp = documents_amplified(spark, sf_dir, 3).cache()
    assert amp.count() == base.count() * 3
    base_pairs = dedup.ngram_jaccard_pairs(base).toPandas()
    amp_pairs = dedup.ngram_jaccard_pairs(amp).toPandas()
    # linear scaling: every replica contributes the same pair set
    assert len(amp_pairs) == 3 * len(base_pairs)
    # no cross-replica pairs (replica id = doc_id // 10_000_000)
    cross = amp_pairs[
        (amp_pairs.doc_a // 10_000_000) != (amp_pairs.doc_b // 10_000_000)
    ]
    assert len(cross) == 0
    # jaccard values exactly preserved (token bijection)
    assert sorted(amp_pairs.jaccard.round(6)) == sorted(
        list(base_pairs.jaccard.round(6)) * 3
    )


def test_amplified_exact_dedup_no_collisions(spark, sf_dir):
    amp = documents_amplified(spark, sf_dir, 2)
    groups = dedup.exact_dedup(amp)
    assert groups.agg(F.max("group_size")).collect()[0][0] == 1
