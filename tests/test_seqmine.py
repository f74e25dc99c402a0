"""PrefixSpan (C10) gate: Spark's distributed miner must agree
hash-exact with an independent pure-Python PrefixSpan over the same
reading-order label sequences (the output SET is defined by data +
thresholds alone, so the two implementations must match row-for-row)."""

from transkribusdu_spark.ops.seqmine import frequent_label_sequences, label_sequences
from transkribusdu_spark.pipeline.parse import parse_pages
from transkribusdu_spark.synth import pages_from_documents


def _mine_reference(sequences, min_support_frac, max_len):
    """Independent PrefixSpan: recursive projected-database mining with
    gaps-allowed subsequence semantics (singleton itemsets)."""
    import math

    n = len(sequences)
    min_count = math.ceil(min_support_frac * n)  # MLlib ceil-support rule
    out = {}

    def project(db, prefix):
        # db: list of suffix lists (projected database)
        if len(prefix) >= max_len:
            return
        # count items occurring in each suffix (first occurrence semantics)
        counts = {}
        for suf in db:
            for item in set(suf):
                counts[item] = counts.get(item, 0) + 1
        for item, c in sorted(counts.items()):
            if c < min_count:
                continue
            pat = prefix + (item,)
            out[pat] = c
            new_db = []
            for suf in db:
                try:
                    i = suf.index(item)
                except ValueError:
                    continue
                new_db.append(suf[i + 1 :])
            project(new_db, pat)

    project([list(s) for s in sequences], ())
    return out


def test_prefixspan_matches_independent_miner(spark, sf_dir):
    nodes = parse_pages(pages_from_documents(spark, sf_dir))
    seq_rows = label_sequences(nodes).collect()
    sequences = [[itemset[0] for itemset in r["sequence"]] for r in seq_rows]

    expected = _mine_reference(sequences, min_support_frac=0.2, max_len=4)

    got_rows = frequent_label_sequences(
        nodes, min_support=0.2, max_pattern_length=4
    ).collect()
    got = {tuple(r["pattern"]): r["support"] for r in got_rows}

    assert got, "miner returned nothing"
    assert got == expected, (
        f"mismatch: only-spark={set(got) - set(expected)} "
        f"only-ref={set(expected) - set(got)} "
        f"count-diffs={[ (p, got[p], expected[p]) for p in set(got) & set(expected) if got[p] != expected[p] ][:5]}"
    )


def test_prefixspan_support_is_document_count(spark, sf_dir):
    nodes = parse_pages(pages_from_documents(spark, sf_dir))
    n_docs = label_sequences(nodes).count()
    rows = frequent_label_sequences(nodes, min_support=0.5, max_pattern_length=2).collect()
    for r in rows:
        assert r["support"] >= 0.5 * n_docs
        assert 1 <= len(r["pattern"]) <= 2
