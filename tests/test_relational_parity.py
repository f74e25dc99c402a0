"""DuckDB parity for the relational queries rotated OUT of the
50-entry driver registry in round 5 (replaced by dedup_clusters,
dup_ngram_spans, repetition_stats and url_snapshot_dedup): they keep
exactly the verification the driver gave them, just run by pytest."""

import duckdb
import pytest

from transkribusdu_spark import relational as rel

PRICING_SQL = """
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) sum_qty,
           round(sum(l_extendedprice), 2) sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) sum_charge,
           round(avg(l_quantity), 6) avg_qty,
           round(avg(l_discount), 6) avg_disc,
           count(*) count_order
    from lineitem where l_shipdate <= timestamp '1998-09-02'
    group by l_returnflag, l_linestatus
"""

TOP_ORDERS_SQL = """
    select o_orderkey, o_orderdate,
           round(sum(l_extendedprice * (1 - l_discount)), 2) revenue
    from lineitem join orders on l_orderkey = o_orderkey
    group by o_orderkey, o_orderdate
    order by revenue desc, o_orderkey asc limit 10
"""


N_CHARS_SQL = """
    select round(quantile_cont(n_chars, 0.25), 6) q25,
           round(quantile_cont(n_chars, 0.5), 6) q50,
           round(quantile_cont(n_chars, 0.75), 6) q75
    from documents
"""

LANG_SOURCE_SQL = "select lang, source, count(*) n from documents group by lang, source"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "documents"):
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return con


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _duck_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(r[i] for i in order) for r in cur.fetchall())


def test_pricing_summary_parity(spark, sf_dir, duck):
    assert _rows(rel.pricing_summary(spark, sf_dir)) == _duck_rows(duck, PRICING_SQL)


def test_top_orders_parity(spark, sf_dir, duck):
    got = _rows(rel.top_orders_by_revenue(spark, sf_dir))
    want = _duck_rows(duck, TOP_ORDERS_SQL)
    assert got == want


def test_n_chars_quartiles_parity(spark, sf_dir, duck):
    assert _rows(rel.n_chars_quartiles(spark, sf_dir)) == _duck_rows(duck, N_CHARS_SQL)


def test_lang_source_matrix_parity(spark, sf_dir, duck):
    got = _rows(rel.lang_source_matrix(spark, sf_dir))
    assert got == _duck_rows(duck, LANG_SOURCE_SQL)
