"""Round-3 layout: 3-column + spanning-block reading order."""

from webextract import corpus
from webextract.pipelines.extract_pipeline import extract_one
from webextract.stages.segment import segment_html


def test_three_column_rows_stay_byte_identical():
    ids = [i for i in range(600) if corpus.is_three_column(i)
           and not corpus.is_corrupt(i)]
    assert len(ids) >= 20
    for i in ids:
        text = corpus.make_text(i)
        html = corpus.render_page(i, text, "en")
        assert extract_one(html) == corpus.gold_text(text, i), i


def test_spanning_block_splits_groups():
    # doc 11: three-col with k=5 paragraphs -> group(0,1) span(2) group(3,4)
    text = " ".join(f"w{i}" for i in range(25))
    html = corpus.render_html(11, text, "en")
    paras = corpus.split_paragraphs(text, 11)
    assert len(paras) == 5
    spans = segment_html(html)
    from webextract.html.decode import decode_fragment

    got = [decode_fragment(html[s["start"]:s["end"]].decode(), s["kind"])
           for s in spans]
    assert got == paras
    # byte order differs from reading order: the spanning para (idx 2) sits
    # between the two reversed column groups in the raw bytes
    byte_order = sorted(spans, key=lambda s: s["start"])
    byte_texts = [decode_fragment(html[s["start"]:s["end"]].decode(),
                                  s["kind"]) for s in byte_order]
    assert byte_texts != paras
    assert byte_texts.index(paras[2]) == 2  # spanning stays in the middle


def test_three_col_without_spanning():
    # < 4 paragraphs: single group, no spanning block; reading order still
    # left -> mid -> right
    text = "alpha beta gamma"
    html = corpus.render_html(11, text, "en")
    # k=5 over 3 words -> some empty chunks dropped -> fewer than 4 paras
    gold = corpus.gold_text(text, 11)
    assert extract_one(html) == gold


def test_mixed_column_classes_in_same_page():
    # handcrafted: 3 columns + spanning + second group, arbitrary order
    html = (b"<html><body><article>"
            b'<div class="columns">'
            b'<div class="col col-right"><p>cc three</p></div>'
            b'<div class="col col-mid"><p>bb two</p></div>'
            b'<div class="col col-left"><p>aa one</p></div>'
            b'<p class="col-span">SPAN section break</p>'
            b'<div class="col col-right"><p>ff six</p></div>'
            b'<div class="col col-left"><p>dd four</p></div>'
            b'<div class="col col-mid"><p>ee five</p></div>'
            b"</div></article></body></html>")
    assert extract_one(html) == (
        "aa one\nbb two\ncc three\nSPAN section break\n"
        "dd four\nee five\nff six")


def test_skipped_bucket_counters(ray_session):
    """Oversized LSH buckets increment the cluster-wide counter actor so a
    run report can show lost-pair counts without grepping logs."""
    import pyarrow as pa
    import ray.data

    from webextract.functions.dedup import neardup_pairs
    from webextract.state.counters import snapshot

    # 30 identical docs -> every band bucket holds 30 rows > max_bucket=10
    rows = {"doc_id": list(range(30)), "text": ["same text here " * 10] * 30}
    pairs = neardup_pairs(ray.data.from_arrow(pa.table(rows)),
                          max_bucket=10, concurrency=1).take_all()
    assert pairs == []  # all buckets skipped
    counts = snapshot(reset=True)
    assert counts["lsh_buckets_skipped"] >= 8
    assert counts["lsh_rows_in_skipped_buckets"] >= 8 * 30
