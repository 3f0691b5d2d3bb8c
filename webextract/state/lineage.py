"""Per-partition lineage manifest + resumable runs (north-rule requirement).

The reference checkpoints only training state (`train_resume.ckpt`,
`mindocr/utils/callbacks.py:215-224`); for a crawl-scale batch job the unit
of resume is the INPUT SHARD. For every input Parquet file we record
`{shard_id, input_file, row_count, content_hash, status}` in a JSONL
manifest next to the outputs; a restarted job skips shards whose manifest
entry is `done` and recomputes only the rest. Output partition layout is a
pure function of input partitioning (one output dir per input shard; no
dynamic repartition in between), per SURVEY.md §7.4.

The content hash is an order-insensitive XOR-fold of per-row md5(url, text)
— computed inside the pipeline as a batch aggregate, so no driver-side
materialization of payloads.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Dict, List

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_NAME = "_MANIFEST.jsonl"


def _row_hash_fold(table: pa.Table, key_col: str = "url", text_col: str = "text") -> int:
    """Order-insensitive 128-bit XOR fold of md5(key \\x00 text) per row."""
    acc = 0
    keys = table.column(key_col).to_pylist() if key_col in table.column_names else [None] * table.num_rows
    texts = table.column(text_col).to_pylist() if text_col in table.column_names else [None] * table.num_rows
    for k, t in zip(keys, texts):
        h = hashlib.md5(
            (k or "").encode("utf-8") + b"\x00" + (t or "").encode("utf-8")
        ).digest()
        acc ^= int.from_bytes(h, "little")
    return acc


def read_manifest(output_dir: str) -> Dict[int, dict]:
    path = os.path.join(output_dir, MANIFEST_NAME)
    done: Dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("status") == "done":
                    done[rec["shard_id"]] = rec
    return done


def _append_manifest(output_dir: str, rec: dict) -> None:
    path = os.path.join(output_dir, MANIFEST_NAME)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())


def input_shards(input_dir: str) -> List[str]:
    return sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    )


def run_resumable(
    input_dir: str,
    output_dir: str,
    pipeline_fn: Callable,
    *,
    key_col: str = "url",
    text_col: str = "text",
) -> dict:
    """Run `pipeline_fn(Dataset) -> Dataset` shard-by-shard with lineage.

    Each input shard executes with full intra-shard parallelism (at crawl
    scale one shard is many blocks); completed shards are skipped on
    restart. The manifest line is written ONLY after the shard's output
    parquet is fully on disk (write-then-commit ordering).

    Returns {"processed": n, "skipped": n, "rows": total_rows}.
    """
    import ray.data

    os.makedirs(output_dir, exist_ok=True)
    done = read_manifest(output_dir)
    shards = input_shards(input_dir)
    processed = skipped = total_rows = 0
    last_stats = ""
    for shard_id, path in enumerate(shards):
        if shard_id in done:
            skipped += 1
            total_rows += done[shard_id]["row_count"]
            continue
        part_dir = os.path.join(output_dir, f"part-{shard_id:05d}")
        # A half-written partition from a killed run is recreated whole.
        if os.path.exists(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        ds = ray.data.read_parquet(path)
        out = pipeline_fn(ds)
        out.write_parquet(part_dir)
        try:
            last_stats = out.stats()  # per-operator wall/cpu observability
        except Exception:  # noqa: BLE001 - stats are best-effort
            last_stats = ""
        row_count = 0
        acc = 0
        for f in sorted(os.listdir(part_dir)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(part_dir, f), columns=None)
            row_count += t.num_rows
            acc ^= _row_hash_fold(t, key_col, text_col)
        _append_manifest(
            output_dir,
            {
                "shard_id": shard_id,
                "input_file": path,
                "row_count": row_count,
                "content_hash": f"{acc:032x}",
                "status": "done",
            },
        )
        processed += 1
        total_rows += row_count
    return {
        "processed": processed,
        "skipped": skipped,
        "rows": total_rows,
        "last_shard_stats": last_stats,
    }
