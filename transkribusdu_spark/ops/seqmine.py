"""Sequential-pattern mining over document structure (reference C10).

The reference mines frequent layout sequences with a bespoke PrefixSpan
(``spm/PrefixSpan.py:10-197``) driven by ``spm/structuralMining.py:42-672``
(vertical-zone / label sequences per page, min-support threshold).

Spark-first: the sequences are built with one groupBy + array_sort
(exactly the extraction stage's canonical reading order, so the mined
alphabet is the label stream a reader sees), and the mining itself is
``pyspark.ml.fpm.PrefixSpan`` — Spark's distributed PrefixSpan (local
projected-database splitting, the same algorithm family as the
reference's implementation). Output is a deterministic SET of
(pattern, support) rows: PrefixSpan's result is defined by the data and
thresholds alone, so any implementation must agree row-for-row — the
pytest gate runs an independent pure-Python miner and compares
hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_sequences(nodes: DataFrame) -> DataFrame:
    """url -> reading-order label sequence (singleton itemsets).

    Ordering matches the extraction stage's canonical
    (page_num, y1, x1, node_id) reading order — array_sort over the
    struct compares fields left-to-right, so no window shuffle is
    needed beyond the one groupBy.
    """
    return (
        nodes.groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("page_num", "y1", "x1", "node_id", "label")
                )
            ).alias("s")
        )
        .select(
            "url",
            F.transform("s", lambda p: F.array(p["label"])).alias("sequence"),
        )
    )


def frequent_label_sequences(
    nodes: DataFrame,
    min_support: float = 0.1,
    max_pattern_length: int = 5,
) -> DataFrame:
    """Frequent reading-order label patterns: (pattern array<string>,
    support long).

    ``min_support`` is a fraction of documents (the reference's
    min-support knob); a pattern is supported by a document when it is
    a subsequence (gaps allowed) of the document's label sequence —
    standard PrefixSpan semantics, identical in the reference and in
    ``pyspark.ml.fpm``. Itemsets are singletons here (one label per
    node), so patterns flatten to plain label arrays.
    """
    from pyspark.ml.fpm import PrefixSpan

    seqs = label_sequences(nodes).select("sequence")
    ps = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
        sequenceCol="sequence",
    )
    res = ps.findFrequentSequentialPatterns(seqs)
    return res.select(
        F.transform("sequence", lambda s: s[0]).alias("pattern"),
        F.col("freq").alias("support"),
    )
