"""End-to-end Ray Dataset pipeline: read -> segment -> extract -> assemble.

Verifies byte-identity via the groupby-url pass and quarantine routing on a
seeded corpus written to /tmp (t1-smoke scale, FIXTURES.md §Scale points).
"""

import os

import pytest
import ray.data

from webextract import corpus
from webextract.pipelines.extract_pipeline import extract_pages
from webextract.sources.pages import pages_from_documents, read_pages

N_ROWS = 200


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages"))
    corpus.write_corpus(path, N_ROWS, rows_per_file=50)
    return path


@pytest.fixture(scope="module")
def result_df(corpus_dir):
    ds = read_pages(corpus_dir)
    out = extract_pages(ds, concurrency=(1, 2), batch_size=64)
    return out.to_pandas()


def test_staged_topology_matches_fused(corpus_dir, result_df):
    """The deploy-pipeline topology (separate detect/extract actor pools)
    must produce the same rows as the fused fast path."""
    out = extract_pages(
        read_pages(corpus_dir),
        fused=False,
        segment_concurrency=1,
        extract_concurrency=1,
        batch_size=64,
    ).to_pandas()
    a = out.sort_values("url", ignore_index=True)
    b = result_df.sort_values("url", ignore_index=True)
    assert (a.text == b.text).all()
    assert (a.status == b.status).all()


def test_row_count_preserved(result_df):
    assert len(result_df) == N_ROWS


def test_output_schema(result_df):
    for col in ["url", "text", "gold_text", "n_blocks", "status", "error", "doctype"]:
        assert col in result_df.columns
    assert "html" not in result_df.columns


def test_byte_identity_all_ok_rows(result_df):
    ok = result_df[result_df.status == "ok"]
    mismatches = ok[ok.text != ok.gold_text]
    assert len(mismatches) == 0, mismatches[["url"]].head()


def test_quarantine_exactly_corrupt_rows(result_df):
    err = set(result_df[result_df.status == "error"].url)
    expected = {corpus.url_of(i) for i in range(N_ROWS) if corpus.is_corrupt(i)}
    assert err == expected
    assert (result_df[result_df.status == "error"].error == "utf8-decode").all()


def test_pdf_branch_routed(result_df):
    pdf = result_df[result_df.doctype == "pdf"]
    expected = {corpus.url_of(i) for i in range(N_ROWS) if corpus.is_pdf(i)}
    assert set(pdf.url) == expected
    assert (pdf.status == "ok").all()


def test_parquet_files_are_sharded(corpus_dir):
    files = [f for f in os.listdir(corpus_dir) if f.endswith(".parquet")]
    assert len(files) == N_ROWS // 50


def test_documents_derived_pages(ray_session):
    out = extract_pages(
        pages_from_documents("/root/testdata/sf0.001"), concurrency=(1, 2)
    )
    df = out.to_pandas()
    assert len(df) == 500
    ok = df[df.status == "ok"]
    assert (ok.text == ok.gold_text).all()


def test_encoding_fallback_latin1(ray_session):
    import pyarrow as pa
    import ray.data

    from webextract.stages.segment import SegmentConfig

    latin = "caf\xe9 cr\xe8me".encode("latin-1")
    html = b"<body><p>" + latin + b"</p></body>"
    t = pa.table({"url": ["u"], "html": pa.array([html], type=pa.binary())})
    # default: quarantined
    strict = extract_pages(ray.data.from_arrow(t), concurrency=1).to_pandas()
    assert strict.status[0] == "error"
    # opt-in fallback: decoded via latin-1
    loose = extract_pages(
        ray.data.from_arrow(t),
        cfg=SegmentConfig(fallback_encoding="latin-1"),
        concurrency=1,
    ).to_pandas()
    assert loose.status[0] == "ok"
    assert loose.text[0] == "café crème"
    assert loose.encoding[0] == "latin-1"


def test_source_fused_path_matches_standard(ray_session, tmp_path):
    """read_extract_pages (html never enters the object store) must produce
    exactly the rows of the standard read -> extract path."""
    from webextract import corpus
    from webextract.pipelines.extract_pipeline import (
        extract_pages,
        read_extract_pages,
    )
    from webextract.sources.pages import read_pages

    d = str(tmp_path / "src_fused")
    corpus.write_corpus(d, 300, rows_per_file=100)
    std = extract_pages(read_pages(d), concurrency=None, batch_size=128)
    fused = read_extract_pages(d, batch_size=128,
                               columns=("url", "warc_ts", "html", "text", "lang"))
    a = std.to_pandas().sort_values("url").reset_index(drop=True)
    b = fused.to_pandas().sort_values("url").reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    for col in ("url", "text", "status", "n_blocks", "doctype"):
        assert list(a[col]) == list(b[col]), col
