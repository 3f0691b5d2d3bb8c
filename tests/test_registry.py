"""Registry / config-driven pipeline compiler tests."""

import pyarrow as pa
import pytest
import ray.data

from webextract import corpus
from webextract.pipelines.registry import build_pipeline, get_op, list_ops, register


def test_registered_ops_present():
    ops = list_ops()
    for name in ["segment", "extract", "assemble", "filter", "select",
                 "minhash", "simhash", "quality_stats", "lang_id",
                 "fingerprint", "salted_repartition"]:
        assert name in ops


def test_unknown_op_raises():
    with pytest.raises(KeyError, match="unknown operator"):
        get_op("nope")


def test_duplicate_registration_raises():
    with pytest.raises(ValueError):
        register("segment")(lambda ds: ds)


def test_spec_compiles_full_extraction_chain():
    rows = list(corpus.generate_pages(30))
    from webextract.schema import PAGES_SCHEMA

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA))
    spec = [
        {"op": "segment", "concurrency": 1, "batch_size": 16},
        {"op": "extract", "concurrency": 1, "batch_size": 16},
        {"op": "assemble"},
        {"op": "filter", "expr": "status == 'ok'"},
        {"op": "select", "columns": ["url", "text", "gold_text"]},
    ]
    out = build_pipeline(ds, spec).to_pandas()
    assert (out.text == out.gold_text).all()
    assert list(out.columns) == ["url", "text", "gold_text"]


def test_salted_repartition_preserves_rows():
    t = pa.table({"url": [f"https://host0.example/{i}" for i in range(100)],
                  "v": list(range(100))})
    out = build_pipeline(
        ray.data.from_arrow(t),
        [{"op": "salted_repartition", "num_blocks": 8}],
    )
    df = out.to_pandas()
    assert len(df) == 100
    assert set(df.v) == set(range(100))
    assert "_salt" not in df.columns
