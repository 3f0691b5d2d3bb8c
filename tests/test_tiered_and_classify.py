"""Tiered giant-page routing + classifier stage tests."""

import pyarrow as pa
import ray.data

from webextract import corpus
from webextract.pipelines.extract_pipeline import extract_pages, extract_pages_tiered
from webextract.schema import PAGES_SCHEMA
from webextract.stages.classify import LangClassifier


def _pages(n=60):
    return pa.Table.from_pylist(list(corpus.generate_pages(n)), schema=PAGES_SCHEMA)


def test_tiered_matches_untiered(ray_session):
    t = _pages(60)
    base = (
        extract_pages(ray.data.from_arrow(t), concurrency=1)
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    # low threshold forces a real split between the two tiers
    tiered = (
        extract_pages_tiered(
            ray.data.from_arrow(t), giant_bytes=3000, concurrency=1
        )
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    assert len(tiered) == len(base)
    assert (tiered.text.values == base.text.values).all()
    assert (tiered.status.values == base.status.values).all()
    assert "_sz" not in tiered.columns


def test_classifier_stage(ray_session):
    t = pa.table(
        {
            "text": [
                "the cat is in the house and that is fine",
                "der hund ist nicht in das haus und die katze",
                "你好世界这是一个中文测试文本需要足够长的内容",
                "",
            ]
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(LangClassifier, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert out.lang_pred.tolist() == ["en", "de", "zh", "und"]
    assert out.charset.tolist() == ["ascii", "ascii", "utf-8", "empty"]


def test_prep_pipeline_lang_filter(ray_session):
    from webextract.pipelines.prep_pipeline import prep_training_data

    t = _pages(40)
    out = prep_training_data(
        ray.data.from_arrow(t), chunk_tokens=32, langs=["en", "de"],
        id_col="url", concurrency=1,
    ).to_pandas()
    assert len(out) > 0
    src = t.to_pandas()
    allowed_urls = set(src[src.lang.isin(["en", "de"])].url)
    assert set(out.url) <= allowed_urls  # chunks only from kept languages
    assert (out.n_tokens <= 32).all()
