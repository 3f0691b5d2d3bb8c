"""Link extraction (stages/links.py) + graph ops (degree_stats, pagerank)."""

import numpy as np
import pyarrow as pa
import ray.data

from webextract.functions.graph import degree_stats, pagerank
from webextract.stages.links import LinkExtractor, extract_links, scan_links


def _ds(table: pa.Table, blocks: int = 2):
    return ray.data.from_arrow(table).repartition(blocks)


# --- scan_links -------------------------------------------------------------


def test_scan_links_basic_and_decode():
    html = (b'<p>x</p><a href="/a">One</a> mid '
            b'<a class="z" href="/b"> Two&amp;Three <em>!</em> </a>')
    assert scan_links(html) == [("/a", "One"), ("/b", "Two&Three !")]


def test_scan_links_nested_and_unclosed():
    # inner <a> ignored (outermost wins); trailing unclosed anchor dropped
    html = (b'<a href="/out">A<a href="/in">B</a>'
            b'<a href="/dangling">tail')
    assert scan_links(html) == [("/out", "AB")]
    # anchor without href contributes nothing
    assert scan_links(b"<a>no href</a>") == []


def test_link_extractor_gates_pdf_and_corrupt():
    rows = pa.table({
        "doc_id": [1, 2, 3],
        "html": [
            b'<a href="/x">ok</a>',
            b"%PDF-1.4 fake",
            b'<a href="/y">bad \xff\xfe</a>',  # invalid utf-8
        ],
    })
    out = LinkExtractor()(rows)
    assert out.column("doc_id").to_pylist() == [1]
    assert out.column("href").to_pylist() == ["/x"]


def test_extract_links_on_corpus_matches_inventory():
    import tempfile

    from webextract import corpus
    from webextract.sources.pages import read_pages

    import pyarrow as pa_

    d = tempfile.mkdtemp(prefix="linkcorpus")
    corpus.write_corpus(d, 200, rows_per_file=100)
    # disk corpus (PAGES_SCHEMA) has no doc_id: key by url
    out = extract_links(read_pages(d), id_col="url",
                        id_type=pa_.string()).to_pandas()
    out["doc_id"] = out["url"].str.rsplit("/", n=1).str[1].astype(int)
    by_doc = out.groupby("doc_id").size().to_dict()
    for doc_id in range(200):
        if doc_id % 50 == 7 or doc_id % 25 == 3:
            assert doc_id not in by_doc  # corrupt / pdf: no links
        else:
            expect = (3 + doc_id % 5) + (4 + doc_id % 3)
            if corpus.is_latin1(doc_id):
                expect += 1  # the sidebar Café link (latin1 fuzz class)
            assert by_doc[doc_id] == expect, doc_id
    # spot-check anchor text decodes through the block-decode chain
    one = out[(out.doc_id == 0) & (out.href == "/p0")]
    assert list(one.anchor) == ["Home"]


# --- degree_stats -----------------------------------------------------------


def test_degree_stats_multiplicity():
    t = pa.table({"src": [1, 1, 2, 3, 1], "dst": [2, 2, 1, 1, 3]})
    out = degree_stats(_ds(t)).to_pandas().set_index("node").sort_index()
    assert out.loc[1].tolist() == [3, 2]  # out 3 (two to 2, one to 3), in 2
    assert out.loc[2].tolist() == [1, 2]
    assert out.loc[3].tolist() == [1, 1]


# --- pagerank ---------------------------------------------------------------


def _dense_pagerank(edges, n_iter, damping=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for a, _ in edges:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.zeros(n)
        dm = r[out_deg == 0].sum()
        for a, b in edges:
            nxt[idx[b]] += r[idx[a]] / out_deg[idx[a]]
        r = (1 - damping) / n + damping * (nxt + dm / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_dense_reference():
    rng = np.random.default_rng(3)
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, 12, size=(60, 2))
                    if a != b})
    t = pa.table({"src": [a for a, _ in edges],
                  "dst": [b for _, b in edges]})
    got = pagerank(_ds(t, blocks=3), n_iter=8).to_pandas()
    want = _dense_pagerank(edges, n_iter=8)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert abs(r.rank - want[int(r.node)]) < 1e-9, int(r.node)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_dangling_mass_redistributed():
    # 1 -> 2, 2 has no out-edges (dangling): mass must recycle, ranks sum 1
    t = pa.table({"src": [1], "dst": [2]})
    got = pagerank(_ds(t, blocks=1), n_iter=12).to_pandas()
    want = _dense_pagerank([(1, 2)], n_iter=12)
    for r in got.itertuples():
        assert abs(r.rank - want[int(r.node)]) < 1e-9
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    # the pointed-to node ends up with more mass
    ranks = dict(zip(got.node, got["rank"]))
    assert ranks[2] > ranks[1]
