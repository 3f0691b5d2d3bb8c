"""EAST-analog strategy: dense proposals + lanms merge reproduce DB spans."""

from webextract import corpus
from webextract.stages.segment import SegmentConfig, segment_html
from webextract.stages.segment_east import segment_east


def _keys(spans):
    return [(s["start"], s["end"], s["kind"]) for s in spans]


def test_matches_db_strategy_on_linear_corpus():
    cfg = SegmentConfig()
    checked = 0
    for doc_id in range(120):
        if (corpus.is_corrupt(doc_id) or corpus.is_two_column(doc_id)
                or corpus.is_three_column(doc_id)):
            continue
        html = corpus.render_page(doc_id, corpus.make_text(doc_id, max_words=80), "en")
        assert _keys(segment_east(html, cfg)) == _keys(segment_html(html, cfg)), doc_id
        checked += 1
    assert checked > 80


def test_denser_evidence_accumulates_score():
    # two text nodes in one block -> two proposals merged, evidence summed
    html = b"<div><p>first node<em>x</em> second node tail</p></div>"
    spans = segment_east(html, SegmentConfig())
    assert len(spans) == 1
    assert spans[0]["score"] == 1.0


def test_link_farm_still_dropped():
    html = b'<p><a href="/x">only links</a></p><p>real text content</p>'
    spans = segment_east(html, SegmentConfig())
    assert len(spans) == 1


def test_pdf_branch():
    pdf = corpus.render_pdf(3, corpus.make_text(3))
    assert all(s["kind"] == "pdf" for s in segment_east(pdf, SegmentConfig()))
