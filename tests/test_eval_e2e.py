"""Combined e2e golden eval (IoU AND exact transcription) + glob source."""

import pyarrow as pa

from webextract.functions.metrics import e2e_prf


def test_match_requires_both_iou_and_text():
    gold = [(0, 10, "hello"), (20, 30, "world")]
    # right span, right text / right span, WRONG text
    pred = [(0, 10, "hello"), (20, 30, "wrold")]
    r = e2e_prf(pred, gold)
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 1)


def test_text_match_with_bad_iou_is_not_tp():
    r = e2e_prf([(50, 60, "hello")], [(0, 10, "hello")])
    assert (r["tp"], r["fp"], r["fn"]) == (0, 1, 1)


def test_ignore_absorbs_predictions():
    gold = [(0, 10, "keep"), (20, 30, "boiler")]
    pred = [(0, 10, "keep"), (20, 30, "anything")]
    r = e2e_prf(pred, gold, ignore=[False, True])
    assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)
    assert r["f1"] == 1.0


def test_eval_e2e_dataset_on_corpus(ray_session):
    """Full-corpus combined eval: extraction with keep_spans vs blocks_gold
    must score P=R=F1=1.0 (every kept block byte-identical + span-aligned)."""
    import ray.data

    from webextract import corpus
    from webextract.functions.metrics import eval_e2e
    from webextract.sources.converters import BLOCKS_GOLD_TYPE

    rows = []
    for doc_id in range(80):
        if corpus.is_corrupt(doc_id) or corpus.is_pdf(doc_id):
            continue
        text = corpus.make_text(doc_id, max_words=60)
        html = corpus.render_page(doc_id, text, "en")
        rows.append(
            {
                "url": corpus.url_of(doc_id),
                "html": html,
                "gold_blocks": corpus.gold_blocks(doc_id, text, "en"),
            }
        )
    tbl = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "html": pa.array([r["html"] for r in rows], type=pa.binary()),
            "gold_blocks": pa.array([r["gold_blocks"] for r in rows],
                                    type=BLOCKS_GOLD_TYPE),
        }
    )
    ds = ray.data.from_arrow(tbl)
    # segment+extract stages directly (no assemble) so block_texts survives
    # for the combined eval
    from webextract.stages.extract import SpanExtractor
    from webextract.stages.segment import BlockSegmenter

    staged = ds.map_batches(BlockSegmenter, batch_format="pyarrow",
                            concurrency=1)
    staged = staged.map_batches(SpanExtractor, batch_format="pyarrow",
                                concurrency=1)
    m = eval_e2e(staged)
    assert m["f1"] == 1.0, m


def test_read_pages_glob(ray_session, tmp_path):
    from webextract.sources.pages import read_pages_glob

    (tmp_path / "a.html").write_bytes(b"<p>alpha doc words</p>")
    (tmp_path / "b.html").write_bytes(b"<p>beta doc words</p>")
    (tmp_path / "skip.txt").write_bytes(b"not html")
    ds = read_pages_glob(str(tmp_path))
    rows = ds.take_all()
    assert len(rows) == 2
    assert {r["url"].rsplit("/", 1)[-1] for r in rows} == {"a.html", "b.html"}
    assert all(r["lang"] == "und" and r["text"] == "" for r in rows)
