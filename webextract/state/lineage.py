"""Per-partition lineage manifest + resumable runs (north-rule requirement).

The reference checkpoints only training state (`train_resume.ckpt`,
`mindocr/utils/callbacks.py:215-224`); for a crawl-scale batch job the unit
of resume is the INPUT SHARD. For every input Parquet file we record
`{shard_id, input_file, row_count, content_hash, status}` in a JSONL
manifest next to the outputs; a restarted job skips shards whose manifest
entry is `done` and recomputes only the rest. Output partition layout is a
pure function of input partitioning (one output dir per input shard; no
dynamic repartition in between), per SURVEY.md §7.4.

The content hash is an order-insensitive XOR-fold of per-row md5(url, text).
It is computed by DISTRIBUTED Ray tasks — one per output Parquet file,
reading only the key/text columns — so the driver never materializes any
payload: it XORs the 16-byte digests the tasks return. (The reference's only
cache-integrity analog is the file-list hash keying PublayNet's label cache,
`mindocr/data/layout_dataset.py:491`.)
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


def _hash_part_file(path: str, key_col: str, text_col: str):
    """(rows, 128-bit fold) of one output file — runs as a Ray task, pruning
    the read to the key/text columns. Plain function so tests can call it."""
    schema_names = pq.read_schema(path).names
    cols = [c for c in (key_col, text_col) if c in schema_names]
    t = pq.read_table(path, columns=cols or None)
    return t.num_rows, _row_hash_fold(t, key_col, text_col)


def _commit_shard(output_dir: str, shard_id: int, path: str, part_dir: str,
                  key_col: str, text_col: str) -> int:
    """Hash + manifest-append one finished partition; returns its row count.

    Hashing is distributed: one Ray task per output file (each reads only
    its own file's key/text columns); the driver combines the 16-byte
    results. No driver-side read of output data, at any scale.
    """
    import ray

    files = [
        os.path.join(part_dir, f)
        for f in sorted(os.listdir(part_dir))
        if f.endswith(".parquet")
    ]
    hash_task = ray.remote(num_cpus=1)(_hash_part_file)
    futures = [hash_task.remote(f, key_col, text_col) for f in files]
    row_count = 0
    acc = 0
    for rows, fold in ray.get(futures):
        row_count += rows
        acc ^= fold
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
    return row_count


def run_resumable(
    input_dir: str,
    output_dir: str,
    pipeline_fn: Callable,
    *,
    key_col: str = "url",
    text_col: str = "text",
    wave_size: int = 1,
) -> dict:
    """Run `pipeline_fn(Dataset) -> Dataset` with per-shard lineage.

    `wave_size=1`: one streaming execution per input shard (full intra-shard
    parallelism; right when shards are big). `wave_size=W>1`: up to W pending
    shards run in ONE streaming execution — rows are tagged with their source
    shard (`include_paths`) and the sink partitions on it
    (`write_parquet(partition_cols=["_shard"])`), so the output layout and
    manifest stay PER SHARD and resume granularity is unchanged. Use waves
    when shards are small and the ~seconds-per-execution fixed cost would
    dominate (measured: 64 small shards cost ~3 s each standalone).

    The manifest line for a shard is written ONLY after its partition is
    fully on disk (write-then-commit); a killed wave leaves uncommitted
    partitions that the next run deletes and recomputes.

    Returns {"processed", "skipped", "rows", "last_shard_stats"}.
    """
    import shutil

    import pyarrow as pa
    import ray.data

    os.makedirs(output_dir, exist_ok=True)
    done = read_manifest(output_dir)
    shards = input_shards(input_dir)
    processed = skipped = total_rows = 0
    last_stats = ""
    pending = []
    for shard_id, path in enumerate(shards):
        rec = done.get(shard_id)
        # a manifest entry only counts if it refers to the SAME input file:
        # a new shard file that sorts earlier shifts every positional id,
        # and silently skipping the wrong shard would corrupt the output
        # (resume must be safe under input-dir appends)
        if rec is not None and os.path.basename(
            rec.get("input_file", "")
        ) == os.path.basename(path):
            skipped += 1
            total_rows += rec["row_count"]
        else:
            pending.append((shard_id, path))

    def part_dir_of(shard_id: int) -> str:
        return os.path.join(output_dir, f"part-{shard_id:05d}")

    for wstart in range(0, len(pending), max(1, wave_size)):
        wave = pending[wstart : wstart + max(1, wave_size)]
        for shard_id, _ in wave:
            if os.path.exists(part_dir_of(shard_id)):
                shutil.rmtree(part_dir_of(shard_id))  # half-written: redo
        if len(wave) == 1:
            shard_id, path = wave[0]
            out = pipeline_fn(ray.data.read_parquet(path))
            out.write_parquet(part_dir_of(shard_id))
        else:
            # Ray's include_paths emits filesystem-resolved paths; key by
            # abspath AND basename so relative --input dirs resolve too
            # (shard filenames are unique within one input dir).
            sid_of = {}
            for sid, path in wave:
                sid_of[os.path.abspath(path)] = sid
                sid_of[os.path.basename(path)] = sid
            ds = ray.data.read_parquet([p for _, p in wave], include_paths=True)

            def _sid(p: str) -> int:
                sid = sid_of.get(os.path.abspath(p))
                if sid is None:
                    sid = sid_of.get(os.path.basename(p))
                if sid is None:
                    raise KeyError(f"output row from unknown input shard: {p!r}")
                return sid

            def tag(batch: pa.Table) -> pa.Table:
                sids = [_sid(p) for p in batch.column("path").to_pylist()]
                return batch.drop_columns(["path"]).append_column(
                    "_shard", pa.array(sids, type=pa.int64())
                )

            out = pipeline_fn(ds.map_batches(tag, batch_format="pyarrow"))
            wave_dir = os.path.join(output_dir, "_wave_tmp")
            shutil.rmtree(wave_dir, ignore_errors=True)
            out.write_parquet(wave_dir, partition_cols=["_shard"])
            for shard_id, _ in wave:
                src = os.path.join(wave_dir, f"_shard={shard_id}")
                if os.path.exists(src):
                    os.rename(src, part_dir_of(shard_id))
                else:  # shard produced zero rows
                    os.makedirs(part_dir_of(shard_id), exist_ok=True)
            shutil.rmtree(wave_dir, ignore_errors=True)
        try:
            last_stats = out.stats()  # per-operator wall/cpu observability
        except Exception:  # noqa: BLE001 - stats are best-effort
            last_stats = ""
        for shard_id, path in wave:
            total_rows += _commit_shard(
                output_dir, shard_id, path, part_dir_of(shard_id),
                key_col, text_col,
            )
            processed += 1
    return {
        "processed": processed,
        "skipped": skipped,
        "rows": total_rows,
        "last_shard_stats": last_stats,
    }
