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


def test_seeded_augment_deterministic(ray_session):
    import pyarrow as pa
    import ray.data

    from webextract.pipelines.registry import get_op

    t = pa.table({"url": [f"u{i}" for i in range(20)],
                  "text": ["alpha beta gamma delta epsilon zeta"] * 20})
    op = get_op("seeded_augment")
    a = op(ray.data.from_arrow(t), drop_rate=0.3).to_pandas()
    b = op(ray.data.from_arrow(t), drop_rate=0.3).to_pandas()
    assert list(a.augmented_text) == list(b.augmented_text)
    # different keys draw different dropouts; some rows differ from input
    assert any(x != "alpha beta gamma delta epsilon zeta"
               for x in a.augmented_text)
    # zero rate keeps text intact
    z = op(ray.data.from_arrow(t), drop_rate=0.0).to_pandas()
    assert all(x == "alpha beta gamma delta epsilon zeta"
               for x in z.augmented_text)


def test_length_bucket_sorts_within_batch(ray_session):
    import pyarrow as pa
    import ray.data

    from webextract.pipelines.registry import get_op

    t = pa.table({"html": [b"x" * n for n in (50, 3, 20, 7, 40, 1)]})
    out = get_op("length_bucket")(ray.data.from_arrow(t), batch_size=6)
    lens = [len(r["html"]) for r in out.take_all()]
    assert lens == sorted(lens)


def test_columnar_to_blocks():
    from webextract.sources.converters import columnar_to_blocks

    t = columnar_to_blocks(
        ["r0", "r1"],
        [["hello", "###"], ["world"]],
        [[(0, 5), (6, 9)], [(0, 5)]],
    )
    b0 = t.column("blocks")[0].as_py()
    assert b0[0]["text"] == "hello" and not b0[0]["ignore"]
    assert b0[1]["ignore"] is True
    assert t.column("blocks")[1].as_py()[0]["start"] == 0


def test_load_spec_json(tmp_path, ray_session):
    import json

    import pyarrow as pa
    import ray.data

    from webextract.pipelines.registry import build_pipeline_from_file

    spec = [{"op": "segment", "concurrency": 1}, {"op": "extract", "concurrency": 1},
            {"op": "assemble"}, {"op": "filter", "expr": "status == 'ok'"}]
    path = tmp_path / "pipe.json"
    path.write_text(json.dumps(spec))
    from webextract import corpus

    rows = list(corpus.generate_pages(30))
    ds = ray.data.from_arrow(pa.table({
        "url": [r["url"] for r in rows],
        "html": pa.array([r["html"] for r in rows], type=pa.binary()),
        "text": [r["text"] for r in rows],
    }))
    out = build_pipeline_from_file(ds, str(path)).to_pandas()
    assert (out.text == out.gold_text).all()


def test_load_spec_unknown_op_fails_fast(tmp_path):
    import json

    import pytest

    from webextract.pipelines.registry import load_spec

    path = tmp_path / "bad.json"
    path.write_text(json.dumps([{"op": "not_an_op"}]))
    with pytest.raises(KeyError, match="not_an_op"):
        load_spec(str(path))
