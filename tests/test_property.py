"""Property-based robustness: the tokenizer/segmenter/decoder must never
crash, hang, or emit out-of-bounds offsets on arbitrary byte soup.

(The reference has no property tests — SURVEY.md §5 notes this gap; crawl
HTML is adversarial, so we close it.)
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from webextract.html.decode import decode_fragment
from webextract.html.tokenizer import iter_events
from webextract.pipelines.extract_pipeline import extract_one
from webextract.stages.segment import segment_html

html_ish = st.binary(max_size=2000) | st.text(max_size=2000).map(
    lambda s: s.encode("utf-8")
)
taggy = st.lists(
    st.sampled_from(
        [b"<p>", b"</p>", b"<div class='x'>", b"</div>", b"<a href=", b"<!--",
         b"-->", b"<script>", b"</script>", b"text ", b"&amp;", b"<", b">",
         b"\xff", b"<li>", b"<pre>", b"</pre>", b"%PDF-", b"(x) Tj"]
    ),
    max_size=60,
).map(b"".join)


@settings(max_examples=300, deadline=None)
@given(html_ish | taggy)
def test_tokenizer_never_crashes_and_offsets_in_bounds(html):
    n = len(html)
    for ev in iter_events(html):
        if ev[0] == "text":
            assert 0 <= ev[1] <= ev[2] <= n
        elif ev[0] in ("open", "close", "skip"):
            for off in ev[2:]:
                if isinstance(off, int):
                    assert 0 <= off <= n


@settings(max_examples=300, deadline=None)
@given(html_ish | taggy)
def test_segment_spans_in_bounds_and_sorted(html):
    spans = segment_html(html)
    prev = -1
    for s in spans:
        assert 0 <= s["start"] <= s["end"] <= len(html)
        assert s["start"] >= prev
        prev = s["start"]
        assert 0.0 <= s["score"] <= 1.0


@settings(max_examples=300, deadline=None)
@given(html_ish | taggy)
def test_extract_one_total_function(html):
    out = extract_one(html)
    assert isinstance(out, str)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=1000))
def test_decode_fragment_idempotent_on_plain_text(s):
    once = decode_fragment(s.replace("<", "").replace("&", ""))
    assert decode_fragment(once.replace("<", "").replace("&", "")) == once


# --- the big one: render->extract byte-identity over arbitrary text ---------

def _canonical(s: str) -> str:
    # corpus contract: single-line, single-space canonical text
    words = s.split()
    return " ".join(w for w in words if w)


@settings(max_examples=200, deadline=None)
@given(
    st.text(min_size=1, max_size=400),
    st.integers(min_value=0, max_value=10_000),
)
def test_render_extract_roundtrip_arbitrary_text(raw, doc_id):
    from webextract import corpus

    text = _canonical(raw)
    if not text:
        return
    html = corpus.render_page(doc_id, text, "en")
    assert extract_one(html) == corpus.gold_text(text, doc_id)
