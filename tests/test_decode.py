"""Decode-rule tests — the byte-identity surface (edge cases per FIXTURES.md §3)."""

from html import unescape

from webextract.html.decode import collapse_ws, decode_fragment, strip_tags


def test_nested_inline():
    assert decode_fragment("a <b><i>bold</i></b> c") == "a bold c"


def test_entity_refs():
    assert decode_fragment("fish &amp; chips &#97;nd &lt;tags&gt;") == "fish & chips and <tags>"


def test_entities_decoded_after_tag_strip():
    # &lt;b&gt; in source text must never be re-parsed as markup.
    assert decode_fragment("x &lt;b&gt;not bold&lt;/b&gt;") == "x <b>not bold</b>"


def test_whitespace_runs():
    assert decode_fragment("  a\n\t b\r\nc  ") == "a b c"


def test_pre_verbatim():
    assert decode_fragment("a\n  b\tc", kind="pre") == "a\n  b\tc"


def test_empty():
    assert decode_fragment("   \n ") == ""
    assert decode_fragment("<b></b>") == ""


def test_cjk():
    assert decode_fragment("<span>你好，世界</span> ok") == "你好，世界 ok"


def test_rtl():
    assert decode_fragment("<b>שלום</b> עולם") == "שלום עולם"


def test_comment_dropped_before_tags():
    assert decode_fragment("a<!-- <b>z</b> -->b") == "ab"


def test_strip_tags_only():
    assert strip_tags("<p>a</p>") == "a"


def test_collapse_idempotent():
    s = "a b c"
    assert collapse_ws(s) == s


def test_ascii_separator_controls_preserved():
    # 0x1c-0x1f are Python str whitespace but NOT in the canonical
    # [ \t\r\n\f\v] collapse set: interior occurrences must survive the
    # ASCII fast path byte-identically (ends still strip, as always).
    for c in ("\x1c", "\x1d", "\x1e", "\x1f"):
        assert decode_fragment(f"a{c}b") == f"a{c}b"
        assert decode_fragment(f"a {c} b") == f"a {c} b"
    # the plain-ASCII fast path itself still collapses normally
    assert decode_fragment("a  \v b") == "a b"


def test_fast_path_matches_canonical_rule():
    # fused fast-path output == the documented rule order, char by char
    frags = [
        "plain text only",
        "a<!--c--> <b>x</b> &amp; y \x1c z",
        "  mixed\t\x1d ws \n ends \x1e  ",
        "unicode   nbsp stays",
    ]
    for f in frags:
        assert decode_fragment(f) == collapse_ws(unescape(strip_tags(f)))
