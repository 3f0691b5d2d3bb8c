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


class TestKieRelations:
    ENTS = [
        {"tok_start": 0, "tok_end": 2, "label": "QUESTION", "text": "q one"},
        {"tok_start": 4, "tok_end": 6, "label": "ANSWER", "text": "a one"},
        {"tok_start": 8, "tok_end": 9, "label": "HEADER", "text": "h"},
        {"tok_start": 10, "tok_end": 12, "label": "question", "text": "q2"},
        {"tok_start": 13, "tok_end": 15, "label": "answer", "text": "a2"},
    ]

    def test_build_relations_normalizes_direction(self):
        from webextract.functions.entities import build_relations

        # reversed pair + duplicate + header pair + q-q pair
        rels = build_relations(
            self.ENTS, [(1, 0), (1, 0), (0, 2), (0, 3), (3, 4)])
        assert rels == [
            {"head": 0, "tail": 1, "start_index": 0, "end_index": 6},
            {"head": 3, "tail": 4, "start_index": 10, "end_index": 15},
        ]

    def test_build_relations_empty_ids_compact(self):
        from webextract.functions.entities import build_relations

        # dropping entity 1 compacts later ids; pairs touching it vanish
        rels = build_relations(self.ENTS, [(1, 0), (4, 3)], empty_ids=[1])
        assert rels == [
            {"head": 2, "tail": 3, "start_index": 10, "end_index": 15}
        ]

    def test_chunk_entities_relations(self):
        from webextract.functions.entities import (
            build_relations,
            chunk_entities_relations,
        )

        toks = [f"t{i}" for i in range(20)]
        rels = build_relations(self.ENTS, [(1, 0), (4, 3)])
        chunks = chunk_entities_relations(toks, self.ENTS, rels,
                                          max_seq_len=8)
        # window [0,8): entities 0,1 + their relation, re-based
        assert chunks[0]["chunk"] == 0
        assert [e["tok_start"] for e in chunks[0]["entities"]] == [0, 4]
        assert chunks[0]["relations"] == [
            {"head": 0, "tail": 1, "start_index": 0, "end_index": 6}]
        # window [8,16): header + q2/a2, relation remapped to local ids
        c1 = chunks[1]
        assert [e["label"] for e in c1["entities"]] == [
            "HEADER", "question", "answer"]
        assert c1["relations"] == [
            {"head": 1, "tail": 2, "start_index": 2, "end_index": 7}]
        # entity straddling a boundary is dropped from both windows
        ents2 = [{"tok_start": 6, "tok_end": 10, "label": "question",
                  "text": "x"}]
        assert chunk_entities_relations(toks, ents2, [], max_seq_len=8) == []
