"""BIO tag-sequence -> entity-span decoding over token streams.

The analog of the reference's SER postprocess
(`mindocr/postprocess/kie_ser_postprocess.py:10-83`,
`VQASerTokenLayoutLMPostProcess`): a per-token BIO tag sequence is decoded
into contiguous entity spans. Decode rules (the exactly-specified order that
makes output deterministic):

* ``B-X`` starts a new span with label X (closing any open span);
* ``I-X`` continues an open span of the SAME label; an ``I-X`` with no
  matching open span starts one (the standard lenient-BIO repair — stray
  continuations become singletons instead of being dropped);
* ``O`` (or any other value) closes the open span;
* end-of-sequence closes the open span.

Span text joins its tokens with a single space (the engine-wide assembly
discipline). Runs per row inside `map_batches`; no state, no shuffle.
"""

from __future__ import annotations

from typing import List, Sequence

import pyarrow as pa


def bio_decode(tokens: Sequence[str], tags: Sequence[str]) -> List[dict]:
    """Decode one (tokens, tags) sequence into entity-span dicts:
    {tok_start, tok_end (exclusive), label, text} in token order."""
    spans: List[dict] = []
    open_start = -1
    open_label = None

    def close(end: int) -> None:
        nonlocal open_start, open_label
        if open_label is not None:
            spans.append(
                {
                    "tok_start": open_start,
                    "tok_end": end,
                    "label": open_label,
                    "text": " ".join(tokens[open_start:end]),
                }
            )
            open_start, open_label = -1, None

    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            close(i)
            open_start, open_label = i, tag[2:]
        elif tag.startswith("I-"):
            label = tag[2:]
            if open_label != label:
                close(i)
                open_start, open_label = i, label
        else:
            close(i)
    close(len(tags))
    return spans


_ENTITIES_TYPE = pa.list_(
    pa.struct(
        [
            ("tok_start", pa.int32()),
            ("tok_end", pa.int32()),
            ("label", pa.string()),
            ("text", pa.string()),
        ]
    )
)


def bio_decode_batch(batch: pa.Table, tokens_col: str = "tokens",
                     tags_col: str = "tags") -> pa.Table:
    """map_batches UDF: add `entities` (list<struct>) per row."""
    toks = batch.column(tokens_col).to_pylist()
    tags = batch.column(tags_col).to_pylist()
    rows = [bio_decode(t or [], g or []) for t, g in zip(toks, tags)]
    return batch.append_column("entities", pa.array(rows, type=_ENTITIES_TYPE))


def explode_entities(batch: pa.Table, id_col: str = "doc_id",
                     tokens_col: str = "tokens",
                     tags_col: str = "tags") -> pa.Table:
    """map_batches UDF: one output row per decoded entity."""
    ids, eidx, ts, te, lb, tx = [], [], [], [], [], []
    for did, toks, tags in zip(batch.column(id_col).to_pylist(),
                               batch.column(tokens_col).to_pylist(),
                               batch.column(tags_col).to_pylist()):
        for j, e in enumerate(bio_decode(toks or [], tags or [])):
            ids.append(did)
            eidx.append(j)
            ts.append(e["tok_start"])
            te.append(e["tok_end"])
            lb.append(e["label"])
            tx.append(e["text"])
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "ent_idx": pa.array(eidx, type=pa.int32()),
            "tok_start": pa.array(ts, type=pa.int32()),
            "tok_end": pa.array(te, type=pa.int32()),
            "label": pa.array(lb, type=pa.string()),
            "ent_text": pa.array(tx, type=pa.string()),
        }
    )


# --- KIE relation extraction (round 3) --------------------------------------
# VQAReTokenRelation / VQAReTokenChunk analogs
# (`mindocr/data/transforms/layoutlm_transforms.py:418-535`): after SER
# produces labeled entity spans, candidate entity-id pairs are normalized
# into question->answer relations, then chunked to the model window.


def build_relations(entities: Sequence[dict],
                    relations: Sequence,
                    empty_ids: Sequence[int] = ()) -> List[dict]:
    """VQAReTokenRelation semantics over our entity-span dicts.

    * `entities`: list indexed by entity id, each with tok_start / tok_end /
      label (question/answer/header, any case);
    * `relations`: candidate (id_a, id_b) pairs in EITHER direction;
    * `empty_ids`: entity ids excluded from output indexing (the
      reference's `empty_entity` set); pairs touching them are dropped and
      surviving ids compact through `entity_id_to_index_map`.

    Output: [{head, tail, start_index, end_index}] where head/tail are
    COMPACTED entity indexes, (start,end) = min/max over both spans'
    bounds (`get_relation_span`), question always the head. Deviation from
    the reference, documented: candidate pairs are fully sorted before
    processing and the output sorts by (head, tail) — the reference sorts
    by head only after a Python-set dedup, leaving tie order
    nondeterministic (layoutlm_transforms.py:431,442).
    """
    empty = set(int(i) for i in empty_ids)
    id_to_index = {}
    for i in range(len(entities)):
        if i not in empty:
            id_to_index[i] = len(id_to_index)
    out: List[dict] = []
    for a, b in sorted({(int(a), int(b)) for a, b in relations}):
        if a in empty or b in empty:
            continue
        if not (0 <= a < len(entities) and 0 <= b < len(entities)):
            continue
        la = (entities[a]["label"] or "").lower()
        lb = (entities[b]["label"] or "").lower()
        if (la, lb) == ("question", "answer"):
            h, t = a, b
        elif (la, lb) == ("answer", "question"):
            h, t = b, a
        else:
            continue
        bounds = (entities[h]["tok_start"], entities[h]["tok_end"],
                  entities[t]["tok_start"], entities[t]["tok_end"])
        out.append({"head": id_to_index[h], "tail": id_to_index[t],
                    "start_index": min(bounds), "end_index": max(bounds)})
    out.sort(key=lambda r: (r["head"], r["tail"]))
    return out


def chunk_entities_relations(tokens: Sequence[str], entities: Sequence[dict],
                             relations: Sequence[dict],
                             max_seq_len: int = 512) -> List[dict]:
    """VQAReTokenChunk semantics: split the token stream into aligned
    max_seq_len windows; keep entities FULLY inside a window (start and end
    both within), re-based to the window; keep relations whose span sits in
    the window, head/tail remapped through the window-local entity index.

    Returns ALL chunks (the reference returns only `encoded_inputs_all[0]`,
    silently discarding overflow chunks — layoutlm_transforms.py:523-525;
    a data pipeline wants every window, so that quirk is not reproduced).
    Windows with no entities are dropped (the reference's
    `len(item["entities"]) > 0` gate).
    """
    chunks: List[dict] = []
    for lo in range(0, max(len(tokens), 1), max_seq_len):
        hi = lo + max_seq_len
        g2l: dict = {}
        ents: List[dict] = []
        for eid, e in enumerate(entities):
            if lo <= e["tok_start"] < hi and lo <= e["tok_end"] < hi:
                g2l[eid] = len(ents)
                ents.append(dict(e, tok_start=e["tok_start"] - lo,
                                 tok_end=e["tok_end"] - lo))
        rels: List[dict] = []
        for r in relations:
            if (lo <= r["start_index"] < hi and lo <= r["end_index"] < hi
                    and r["head"] in g2l and r["tail"] in g2l):
                rels.append({"head": g2l[r["head"]], "tail": g2l[r["tail"]],
                             "start_index": r["start_index"] - lo,
                             "end_index": r["end_index"] - lo})
        if ents:
            chunks.append({"chunk": lo // max_seq_len,
                           "tokens": list(tokens[lo:hi]),
                           "entities": ents, "relations": rels})
    return chunks


def explode_relations(batch: pa.Table, id_col: str = "doc_id",
                      tokens_col: str = "tokens", tags_col: str = "tags",
                      cand_col: str = "rel_candidates") -> pa.Table:
    """map_batches UDF: (tokens, tags, candidate id pairs) rows -> one
    output row per normalized question->answer relation."""
    ids, hh, tt, si, ei = [], [], [], [], []
    for did, toks, tags, cands in zip(
            batch.column(id_col).to_pylist(),
            batch.column(tokens_col).to_pylist(),
            batch.column(tags_col).to_pylist(),
            batch.column(cand_col).to_pylist()):
        ents = bio_decode(toks or [], tags or [])
        for r in build_relations(ents, [(p[0], p[1]) for p in cands or []]):
            ids.append(did)
            hh.append(r["head"])
            tt.append(r["tail"])
            si.append(r["start_index"])
            ei.append(r["end_index"])
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "head": pa.array(hh, type=pa.int32()),
            "tail": pa.array(tt, type=pa.int32()),
            "start_index": pa.array(si, type=pa.int32()),
            "end_index": pa.array(ei, type=pa.int32()),
        }
    )
