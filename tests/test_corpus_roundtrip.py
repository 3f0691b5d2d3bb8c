"""Gold-first round-trip: render known text -> extract -> byte-identical.

The analog of the reference system test drawing known TEXTS_2 onto a blank
image then OCR-ing it back (`tests/st/test_online_infer.py:10-44`).
Pure-function path here; the Ray Dataset path is test_pipeline_e2e.py.
"""

import pytest

from webextract import corpus
from webextract.pipelines.extract_pipeline import extract_one


@pytest.mark.parametrize("doc_id", list(range(120)))
def test_roundtrip_byte_identical(doc_id):
    text = corpus.make_text(doc_id)
    html = corpus.render_page(doc_id, text, "en")
    assert extract_one(html) == corpus.gold_text(text, doc_id)


def test_corrupt_rows_yield_empty():
    doc_id = corpus.CORRUPT_REM
    assert corpus.is_corrupt(doc_id)
    html = corpus.render_page(doc_id, corpus.make_text(doc_id), "en")
    with pytest.raises(UnicodeDecodeError):
        html.decode("utf-8", "strict")
    assert extract_one(html) == ""


def test_pdf_rows_roundtrip():
    doc_id = corpus.PDF_REM
    assert corpus.is_pdf(doc_id)
    text = corpus.make_text(doc_id)
    html = corpus.render_page(doc_id, text, "en")
    assert html[:5] == b"%PDF-"
    assert extract_one(html) == corpus.gold_text(text, doc_id)


def test_determinism_across_calls():
    a = corpus.render_page(5, corpus.make_text(5), "en")
    b = corpus.render_page(5, corpus.make_text(5), "en")
    assert a == b


def test_giant_page_tail_exists():
    sizes = [len(corpus.make_text(i)) for i in range(2000)]
    assert max(sizes) > 20 * (sum(sizes) / len(sizes))


def test_host_skew():
    hosts = [corpus.host_of(i) for i in range(1000)]
    assert sum(1 for h in hosts if h == 0) / len(hosts) == pytest.approx(0.3, abs=0.02)


def test_split_matches_oracle_contract():
    # words[i*n//k : (i+1)*n//k] joined ' ', chunks joined '\n' — the SQL
    # oracle in __ray_entry__ mirrors this exactly.
    text = "a b c d e f g"
    assert corpus.split_paragraphs(text, 2) == ["a b", "c d", "e f g"]
    assert corpus.gold_text(text, 0) == text


def test_ray_corpus_writer_parity(ray_session, tmp_path):
    """write_corpus_ray must produce the same logical rows as write_corpus."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    import glob

    from webextract.corpus import write_corpus, write_corpus_ray

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    write_corpus(a_dir, 80, rows_per_file=40)
    write_corpus_ray(b_dir, 80, rows_per_file=40)

    def load(d):
        t = pa.concat_tables(
            [pq.read_table(f) for f in sorted(glob.glob(d + "/*.parquet"))]
        )
        return t.to_pandas().sort_values("url", ignore_index=True)

    da, db = load(a_dir), load(b_dir)
    assert len(da) == len(db) == 80
    for col in ["url", "warc_ts", "html", "text", "lang"]:
        assert (da[col] == db[col]).all(), col
