"""Training-data ops: dedup, similarity, textstats, multimodal —
validated against DuckDB oracles at sf0.001 (the driver's gate runs the
same comparisons at sf0.01 via tools/check_oracles.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from transkribusdu_spark.ops import dedup, similarity, textstats
from transkribusdu_spark.ops.multimodal import attach_media, extract_binary_features


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return con


def test_exact_dedup_counts(docs, duck):
    got = dedup.exact_dedup(docs).agg(F.sum("group_size")).collect()[0][0]
    want = duck.execute("select count(*) from documents").fetchone()[0]
    assert got == want


def test_minhash_lsh_recall_vs_exact(docs):
    exact = dedup.ngram_jaccard_pairs(docs).toPandas()
    lsh = dedup.minhash_lsh_pairs(docs).toPandas()
    want = set(zip(exact.doc_a, exact.doc_b))
    got = set(zip(lsh.doc_a, lsh.doc_b))
    assert want == got  # verification stage makes LSH output == exact set


def test_simhash_matches_duckdb(docs, duck):
    got = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    rows = duck.execute(
        """
        with tok as (select doc_id, unnest(string_split(text,' ')) t from documents),
        h as (select doc_id, cast(('0x'||substr(md5(t),1,15)) as ubigint)::bigint h from tok),
        bits as (select doc_id, b, sum(case when (h >> b) & 1 = 1 then 1 else -1 end) s
                 from h cross join (select unnest(range(60)) b) bb group by 1,2)
        select doc_id, sum(case when s > 0 then (1::bigint << b) else 0 end)::bigint
        from bits group by 1
        """
    ).fetchall()
    for doc_id, sh in rows:
        assert got[doc_id] == sh


def test_simhash_blocking_equals_allpairs(docs):
    pairs = dedup.simhash_near_pairs(docs, max_hamming=8).toPandas()
    sig = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    import itertools

    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sig), 2)
        if bin(sig[a] ^ sig[b]).count("1") <= 8
    }
    assert set(zip(pairs.doc_a, pairs.doc_b)) == want


def test_knn_bruteforce_matches_duckdb(emb, duck):
    got = similarity.knn_bruteforce(emb, similarity.self_queries(emb, 5), k=3).toPandas()
    want = duck.execute(
        """
        with e as (select vec_id, embedding::double[] v from embeddings),
        q as (select vec_id query_id, v qv from e order by vec_id limit 5),
        s as (select query_id, vec_id, round(list_cosine_similarity(qv,v),6) cosine
              from q cross join e where vec_id != query_id),
        r as (select *, row_number() over (partition by query_id
              order by cosine desc, vec_id asc) rank from s)
        select query_id, vec_id, cosine, rank from r where rank <= 3
        """
    ).fetchdf()
    g = sorted(map(tuple, got[["query_id", "vec_id", "rank"]].itertuples(index=False)))
    w = sorted(map(tuple, want[["query_id", "vec_id", "rank"]].itertuples(index=False)))
    assert g == w


def test_ann_lsh_recall(emb):
    k = 5
    exact = similarity.knn_bruteforce(emb, similarity.self_queries(emb, 10), k=k).toPandas()
    approx = similarity.ann_lsh(emb, similarity.self_queries(emb, 10), k=k).toPandas()
    want = set(zip(exact.query_id, exact.vec_id))
    got = set(zip(approx.query_id, approx.vec_id))
    recall = len(want & got) / len(want)
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_language_id_deterministic(docs):
    out = textstats.language_id(docs).toPandas()
    assert set(out.pred_lang.unique()) <= {"de", "en", "fi", "fr"}
    assert len(out) == docs.count()


def test_multimodal_plumbing(docs):
    media = attach_media(docs)
    feats = extract_binary_features(media).toPandas()
    assert len(feats) == docs.count()
    assert (feats.n_bytes > 0).all()
    assert all(len(h) == 16 for h in feats.byte_hist)
    assert all(abs(sum(h) - 1.0) < 1e-3 for h in feats.byte_hist)


def test_decode_real_is_stubbed(docs):
    from transkribusdu_spark.ops.multimodal import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(attach_media(docs))


def test_ivf_knn_recall(emb):
    k = 5
    exact = similarity.knn_bruteforce(emb, similarity.self_queries(emb, 10), k=k).toPandas()
    approx = similarity.ivf_knn(emb, similarity.self_queries(emb, 10), k=k,
                                n_cells=8, n_probe=4).toPandas()
    want = set(zip(exact.query_id, exact.vec_id))
    got = set(zip(approx.query_id, approx.vec_id))
    recall = len(want & got) / len(want)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # ranks must be dense 1..k per query
    assert (approx.groupby("query_id")["rank"].max() == k).all()
