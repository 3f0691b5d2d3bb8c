"""Tokenizer unit tests (byte-offset invariants, malformed input tolerance)."""

from webextract.html.tokenizer import get_attr, iter_events


def events(html: bytes):
    return list(iter_events(html))


def test_basic_tags_and_text():
    html = b"<p>hello</p>"
    evs = events(html)
    assert evs[0][0] == "open" and evs[0][1] == "p"
    assert evs[1][0] == "text" and html[evs[1][1] : evs[1][2]] == b"hello"
    assert evs[2][0] == "close" and evs[2][1] == "p"


def test_offsets_index_original_bytes():
    html = b'<div class="x"><p>a<b>b</b>c</p></div>'
    text = b"".join(html[e[1] : e[2]] for e in events(html) if e[0] == "text")
    assert text == b"abc"


def test_script_and_style_content_skipped():
    html = b"<script>var a = '<p>not a tag</p>';</script><p>x</p>"
    evs = events(html)
    texts = [html[e[1] : e[2]] for e in evs if e[0] == "text"]
    assert texts == [b"x"]
    skips = [e for e in evs if e[0] == "skip" and e[1] == "script"]
    assert len(skips) == 1
    assert html[skips[0][2] : skips[0][3]] == b"var a = '<p>not a tag</p>';"


def test_comment_and_doctype_skipped():
    html = b"<!DOCTYPE html><!-- <p>no</p> --><p>y</p>"
    texts = [html[e[1] : e[2]] for e in events(html) if e[0] == "text"]
    assert texts == [b"y"]


def test_stray_lt_is_text():
    html = b"<p>a < b</p>"
    texts = b"".join(html[e[1] : e[2]] for e in events(html) if e[0] == "text")
    assert texts == b"a < b"


def test_unterminated_tag_at_eof():
    html = b"<p>ok</p><div class="
    evs = events(html)  # must not raise or loop
    assert ("close", "p", 5, 9) in evs


def test_attr_extraction():
    html = b"<div class='side bar' id=main data-x=\"1\">"
    evs = events(html)
    _, tag, a0, a1, _, _ = evs[0]
    assert get_attr(html, a0, a1, "class") == b"side bar"
    assert get_attr(html, a0, a1, "id") == b"main"
    assert get_attr(html, a0, a1, "data-x") == b"1"
    assert get_attr(html, a0, a1, "missing") is None


def test_self_closing_and_void():
    html = b"<p>a<br>b<img src=x>c</p>"
    texts = b"".join(html[e[1] : e[2]] for e in events(html) if e[0] == "text")
    assert texts == b"abc"
