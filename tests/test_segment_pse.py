"""PSE-analog segmentation: kernels + sibling region growing."""

import pyarrow as pa

from webextract.stages.extract import decode_span
from webextract.stages.segment import SegmentConfig
from webextract.stages.segment_pse import segment_pse


def _regions(html: bytes, cfg=SegmentConfig()):
    return [
        (s["start"], s["end"], decode_span(html, s["start"], s["end"], "p"))
        for s in segment_pse(html, cfg)
    ]


def test_isolated_kernels_stay_separate():
    html = b"<div><p>first paragraph words</p></div><div><p>second paragraph words</p></div>"
    texts = [t for _, _, t in _regions(html)]
    assert texts == ["first paragraph words", "second paragraph words"]


def test_link_dense_connector_absorbed_between_kernels():
    # DB-mode drops the link-farm <p>; PSE grows through it, merging the
    # region (recall-leaning, like PSE absorbing weak pixels between kernels)
    html = (
        b"<div>"
        b"<p>long enough kernel paragraph one</p>"
        b'<p><a href="/x">click</a> <a href="/y">here</a></p>'
        b"<p>long enough kernel paragraph two</p>"
        b"</div>"
    )
    regions = _regions(html)
    assert len(regions) == 1
    assert "kernel paragraph one" in regions[0][2]
    assert "click" in regions[0][2]
    assert "kernel paragraph two" in regions[0][2]


def test_connector_with_different_parent_not_absorbed():
    html = (
        b"<div><p>kernel paragraph one text</p></div>"
        b'<div><p><a href="/x">pure link farm</a></p></div>'
        b"<div><p>kernel paragraph two text</p></div>"
    )
    regions = _regions(html)
    assert len(regions) == 2
    assert "pure link" not in regions[0][2] + regions[1][2]


def test_boiler_never_grown_into():
    html = (
        b'<aside class="sidebar"><p>ad block text</p></aside>'
        b"<div><p>real article content text</p></div>"
    )
    regions = _regions(html)
    assert len(regions) == 1
    assert "ad block" not in regions[0][2]


def test_no_kernels_no_regions():
    html = b'<div><p><a href="/x">only links here</a></p></div>'
    assert _regions(html) == []


def test_pdf_branch_delegates():
    from webextract import corpus

    pdf = corpus.render_pdf(3, corpus.make_text(3))
    spans = segment_pse(pdf, SegmentConfig())
    assert spans and all(s["kind"] == "pdf" for s in spans)


def test_block_segmenter_strategy_plugin(ray_session):
    import ray.data

    from webextract.stages.segment import BlockSegmenter

    html = (
        b"<div><p>kernel one long enough</p>"
        b'<p><a href="/x">links</a></p>'
        b"<p>kernel two long enough</p></div>"
    )
    batch = pa.table(
        {"url": ["u"], "html": pa.array([html], type=pa.binary())}
    )
    db = BlockSegmenter(strategy="db")(batch)
    pse = BlockSegmenter(strategy="pse")(batch)
    assert len(db.column("spans")[0].as_py()) == 2  # link farm dropped
    assert len(pse.column("spans")[0].as_py()) == 1  # one grown region


def test_scan_candidates_nested_unclosed_blocks():
    """ADVICE round-2: closing an ancestor must finalize unclosed
    descendant blocks (mirror of segment._scan_blocks), not blind-pop one."""
    from webextract.stages.segment import SegmentConfig
    from webextract.stages.segment_pse import _scan_candidates

    html = (b"<html><body><li>item one <p>alpha beta gamma"
            b"<p>delta epsilon zeta</li><p>closing paragraph text</p>"
            b"</body></html>")
    cands = _scan_candidates(html, SegmentConfig())
    texts = {html[c.start:c.end] for c in cands}
    # both nested unclosed <p> blocks AND the <li> survive, plus the sibling
    assert b"delta epsilon zeta" in texts
    assert any(t.startswith(b"alpha beta gamma") for t in texts)
    assert any(t.startswith(b"item one") for t in texts)
    assert b"closing paragraph text" in texts
