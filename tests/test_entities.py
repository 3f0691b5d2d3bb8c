"""BIO entity-span decode semantics (kie_ser_postprocess analog)."""

import pyarrow as pa

from webextract.functions.entities import bio_decode, explode_entities


def spans(tokens, tags):
    return [(e["tok_start"], e["tok_end"], e["label"], e["text"])
            for e in bio_decode(tokens, tags)]


def test_basic_bi_span():
    assert spans(["John", "Smith", "works"], ["B-PER", "I-PER", "O"]) == [
        (0, 2, "PER", "John Smith")
    ]


def test_adjacent_b_starts_new_span():
    assert spans(["a", "b"], ["B-X", "B-X"]) == [
        (0, 1, "X", "a"), (1, 2, "X", "b")
    ]


def test_stray_i_starts_span():
    assert spans(["a", "b", "c"], ["O", "I-Y", "I-Y"]) == [(1, 3, "Y", "b c")]


def test_label_switch_inside_i_run():
    assert spans(["a", "b"], ["I-X", "I-Y"]) == [
        (0, 1, "X", "a"), (1, 2, "Y", "b")
    ]


def test_span_open_at_end_is_closed():
    assert spans(["a", "b"], ["O", "B-Z"]) == [(1, 2, "Z", "b")]


def test_all_o_and_empty():
    assert spans(["a", "b"], ["O", "O"]) == []
    assert spans([], []) == []


def test_explode_entities_batch():
    b = pa.table(
        {
            "doc_id": pa.array([3], type=pa.int64()),
            "tokens": pa.array([["x", "y", "z"]], type=pa.list_(pa.string())),
            "tags": pa.array([["B-A", "I-A", "B-B"]], type=pa.list_(pa.string())),
        }
    )
    out = explode_entities(b)
    assert out.column("doc_id").to_pylist() == [3, 3]
    assert out.column("ent_idx").to_pylist() == [0, 1]
    assert out.column("tok_start").to_pylist() == [0, 2]
    assert out.column("tok_end").to_pylist() == [2, 3]
    assert out.column("label").to_pylist() == ["A", "B"]
    assert out.column("ent_text").to_pylist() == ["x y", "z"]
