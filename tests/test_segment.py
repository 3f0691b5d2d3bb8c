"""Detect-stage unit tests: density scoring, boilerplate rules, span offsets.

Hand-built small cases in the spirit of the reference's metric tests with
hand-computed geometry (`tests/ut/test_metrics.py:31-60`).
"""

from webextract.stages.segment import SegmentConfig, segment_html, segment_pdf
from webextract.stages.extract import decode_span


def kinds(spans):
    return [s["kind"] for s in spans]


def texts(html, spans):
    return [decode_span(html, s["start"], s["end"], s["kind"]) for s in spans]


def test_simple_paragraphs():
    html = b"<body><p>one</p><p>two</p></body>"
    spans = segment_html(html)
    assert texts(html, spans) == ["one", "two"]
    assert kinds(spans) == ["p", "p"]


def test_reading_order_is_byte_order():
    html = b"<h1>t</h1><p>a</p><li>b</li>"
    assert texts(html, segment_html(html)) == ["t", "a", "b"]


def test_nav_aside_footer_header_excluded():
    html = (
        b"<header><p>head text</p></header>"
        b"<nav><li><a href=x>Home</a></li></nav>"
        b"<p>main</p>"
        b"<aside><p>side text</p></aside>"
        b"<footer><p>foot text</p></footer>"
    )
    assert texts(html, segment_html(html)) == ["main"]


def test_boiler_class_hint():
    html = b'<div class="comments"><p>spam</p></div><p>real</p>'
    assert texts(html, segment_html(html)) == ["real"]


def test_link_farm_dropped_by_density():
    html = b'<p><a href=1>x</a> <a href=2>y</a> <a href=3>z</a></p><p>keep me now</p>'
    assert texts(html, segment_html(html)) == ["keep me now"]


def test_partial_links_kept():
    html = b"<p>long text with <a href=x>one link</a> inside a paragraph body</p>"
    spans = segment_html(html)
    assert len(spans) == 1
    assert 0 < spans[0]["score"] < 1.0


def test_leaf_preference_nested_blocks():
    html = b"<li>outer <p>inner</p></li>"
    spans = segment_html(html)
    assert texts(html, spans) == ["inner"]


def test_empty_blocks_dropped():
    html = b"<p>   </p><p>a</p><p></p>"
    assert texts(html, segment_html(html)) == ["a"]


def test_max_candidates_cap():
    html = b"".join(b"<p>w%d</p>" % i for i in range(50))
    cfg = SegmentConfig(max_candidates=10)
    assert len(segment_html(html, cfg)) == 10


def test_spans_are_byte_offsets():
    html = "<p>héllo</p>".encode("utf-8")
    spans = segment_html(html)
    s = spans[0]
    assert html[s["start"] : s["end"]].decode("utf-8") == "héllo"


def test_pdf_spans():
    pdf = b"%PDF-1.4\nBT (hello \\(world\\)) Tj ET\n%%EOF"
    spans = segment_pdf(pdf, SegmentConfig())
    assert texts(pdf, spans) == ["hello (world)"]


def test_unclosed_block_at_eof_dropped():
    html = b"<p>closed</p><p>never closed"
    assert texts(html, segment_html(html)) == ["closed"]


def test_div_soup_fallback():
    # no semantic block tags at all: leaf divs with enough text win
    html = (b"<body><div class='wrap'><div>this is the real article content "
            b"of the page</div></div>"
            b"<div><a href=x>m</a><a href=y>n</a></div></body>")
    spans = segment_html(html)
    assert texts(html, spans) == ["this is the real article content of the page"]
    assert kinds(spans) == ["div"]


def test_div_fallback_not_used_when_blocks_exist():
    html = b"<p>real</p><div>ignored because p exists and won</div>"
    assert texts(html, segment_html(html)) == ["real"]


def test_div_fallback_disabled():
    cfg = SegmentConfig(div_fallback=False)
    html = b"<div>only divs here with plenty of text</div>"
    assert segment_html(html, cfg) == []
