"""Lineage manifest + resume semantics: killed-partition recompute only."""

import json
import os

import pyarrow.parquet as pq
import pytest

from webextract import corpus
from webextract.pipelines.extract_pipeline import extract_pages
from webextract.state.lineage import (
    MANIFEST_NAME,
    input_shards,
    read_manifest,
    run_resumable,
)


@pytest.fixture(scope="module")
def in_dir(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("lineage_in"))
    corpus.write_corpus(p, 120, rows_per_file=30)  # 4 shards
    return p


def _pipeline(ds):
    return extract_pages(ds, concurrency=1, batch_size=32)


def test_fresh_run_processes_all(in_dir, tmp_path):
    out = str(tmp_path / "out")
    stats = run_resumable(in_dir, out, _pipeline)
    assert (stats["processed"], stats["skipped"], stats["rows"]) == (4, 0, 120)
    assert "Operator" in stats["last_shard_stats"]  # ds.stats() observability
    manifest = read_manifest(out)
    assert sorted(manifest) == [0, 1, 2, 3]
    for rec in manifest.values():
        assert rec["row_count"] == 30
        assert len(rec["content_hash"]) == 32
    # partitioned output layout: one dir per input shard
    parts = [d for d in os.listdir(out) if d.startswith("part-")]
    assert len(parts) == 4


def test_resume_skips_done_and_recomputes_missing(in_dir, tmp_path):
    out = str(tmp_path / "out2")
    run_resumable(in_dir, out, _pipeline)
    # simulate a killed run: drop shard 2 from the manifest + its output
    manifest_path = os.path.join(out, MANIFEST_NAME)
    with open(manifest_path) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    kept = [r for r in recs if r["shard_id"] != 2]
    with open(manifest_path, "w") as f:
        for r in kept:
            f.write(json.dumps(r) + "\n")
    import shutil

    shutil.rmtree(os.path.join(out, "part-00002"))

    stats = run_resumable(in_dir, out, _pipeline)
    assert stats["processed"] == 1  # ONLY the missing shard
    assert stats["skipped"] == 3
    # recomputed hash identical to the original (determinism)
    new = read_manifest(out)[2]
    old = next(r for r in recs if r["shard_id"] == 2)
    assert new["content_hash"] == old["content_hash"]


def test_half_written_partition_is_rebuilt(in_dir, tmp_path):
    out = str(tmp_path / "out3")
    run_resumable(in_dir, out, _pipeline)
    manifest_path = os.path.join(out, MANIFEST_NAME)
    with open(manifest_path) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    with open(manifest_path, "w") as f:
        for r in recs:
            if r["shard_id"] != 1:
                f.write(json.dumps(r) + "\n")
    # shard 1 output left on disk (simulates kill after write, before commit)
    stats = run_resumable(in_dir, out, _pipeline)
    assert stats["processed"] == 1 and stats["skipped"] == 3
    rows = sum(
        pq.read_metadata(os.path.join(out, "part-00001", f)).num_rows
        for f in os.listdir(os.path.join(out, "part-00001"))
        if f.endswith(".parquet")
    )
    assert rows == 30


def test_input_shards_sorted(in_dir):
    shards = input_shards(in_dir)
    assert shards == sorted(shards)
    assert len(shards) == 4


def test_wave_mode_matches_serial(in_dir, tmp_path):
    """wave_size>1 must produce identical partitions, hashes, and resume
    behavior as shard-at-a-time mode."""
    out_serial = str(tmp_path / "serial")
    out_wave = str(tmp_path / "wave")
    run_resumable(in_dir, out_serial, _pipeline)
    stats = run_resumable(in_dir, out_wave, _pipeline, wave_size=4)
    assert (stats["processed"], stats["rows"]) == (4, 120)
    ms, mw = read_manifest(out_serial), read_manifest(out_wave)
    assert sorted(ms) == sorted(mw) == [0, 1, 2, 3]
    for sid in ms:
        assert ms[sid]["content_hash"] == mw[sid]["content_hash"], sid
        assert ms[sid]["row_count"] == mw[sid]["row_count"]
    # resume after dropping one shard works in wave mode too
    import json as _json

    mpath = os.path.join(out_wave, MANIFEST_NAME)
    with open(mpath) as f:
        recs = [_json.loads(l) for l in f if l.strip()]
    with open(mpath, "w") as f:
        for r in recs:
            if r["shard_id"] != 1:
                f.write(_json.dumps(r) + "\n")
    import shutil as _shutil

    _shutil.rmtree(os.path.join(out_wave, "part-00001"))
    stats2 = run_resumable(in_dir, out_wave, _pipeline, wave_size=4)
    assert stats2["processed"] == 1 and stats2["skipped"] == 3
    assert read_manifest(out_wave)[1]["content_hash"] == ms[1]["content_hash"]


def test_resume_detects_shifted_shard_ids(in_dir, tmp_path):
    """A NEW input file that sorts before existing shards shifts every
    positional shard id; resume must recompute shifted shards instead of
    silently skipping the wrong ones (manifest entries are only honored
    when their input_file matches)."""
    import shutil

    work_in = str(tmp_path / "in_shift")
    shutil.copytree(in_dir, work_in)
    out = str(tmp_path / "out_shift")
    run_resumable(work_in, out, _pipeline)
    assert len(read_manifest(out)) == 4

    # new shard whose name sorts FIRST
    corpus.write_corpus(str(tmp_path / "extra"), 30, rows_per_file=30)
    shutil.copy(
        os.path.join(str(tmp_path / "extra"), "pages-00000.parquet"),
        os.path.join(work_in, "aaa-new.parquet"),
    )
    stats = run_resumable(work_in, out, _pipeline)
    # ids shifted for everything: all 5 shards recomputed (0 wrongly skipped)
    assert stats["processed"] == 5
    assert stats["rows"] == 150
