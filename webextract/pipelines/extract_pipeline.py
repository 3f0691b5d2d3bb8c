"""The flagship detect-then-extract pipeline as a Ray Data graph.

Replaces the reference's hand-built process-per-stage pipeline
(`deploy/py_infer/src/parallel/framework/pipeline_manager.py:40-65`:
HandoutNode -> DecodeNode -> Det* -> Rec* -> CollectNode wired with
`multiprocessing.Queue(16)`) with a streaming Dataset graph — Ray's executor
provides the queues, backpressure, replica scheduling and keyed collection
for free (SURVEY.md §3.3):

    read_parquet -> map_batches(BlockSegmenter)   # detect (actor pool)
                 -> map_batches(SpanExtractor)    # extract (actor pool)
                 -> map_batches(assemble_batch)   # collect (stateless)

Blocks stay NESTED per document row (list<struct> spans / list<string>
texts), so detect->extract is shuffle-free — the preferred mapping of the
reference's det->rec fan-out/re-join (`predict_system.py:277-336`), which
itself keeps crops attached to the per-image record.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple, Union

import pyarrow as pa
import ray.data

from webextract.stages.assemble import assemble_batch
from webextract.stages.extract import SpanExtractor, decode_span
from webextract.stages.segment import (
    _PDF_MAGIC,
    BlockSegmenter,
    SegmentConfig,
    segment_html,
)

Concurrency = Union[int, Tuple[int, int], None]

_SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("start", pa.int64()),
            ("end", pa.int64()),
            ("kind", pa.string()),
            ("score", pa.float64()),
        ]
    )
)


class FusedExtractor:
    """Detect+extract+assemble in ONE actor (`fused=True` fast path).

    The reference offers the same two topologies: the serial online system
    runs det->rec in one process (`predict_system.py:255-355`) while the
    deploy pipeline splits them into replicated stage processes
    (`pipeline_manager.py:40-65`). Measured here, the fused pool runs at the
    framework floor (read+write bound) because block fragments never cross
    the object store between stages.

    Unlike the staged path, the fused kernel never MATERIALIZES the
    intermediate `spans`/`block_html` list columns: each document goes
    segment -> decode -> join in one pass, and only the final compact
    columns are built (the det stage's explicit `data`/`frame` free,
    `det_post_node.py:44-48`, taken to its logical end). Output schema is
    identical to the staged path (pytest-pinned). The staged mode remains
    for heterogeneous pools (e.g. a GPU-weighted extract stage).
    """

    def __init__(self, cfg: Optional[SegmentConfig] = None,
                 drop_score: float = 0.5, keep_spans: bool = False):
        self.cfg = cfg or SegmentConfig()
        self.drop_score = drop_score
        self.keep_spans = keep_spans

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        drop_score = self.drop_score
        keep_spans = self.keep_spans
        texts: List[str] = []
        n_blocks: List[int] = []
        status_col: List[str] = []
        error_col: List[str] = []
        doctype_col: List[str] = []
        encoding_col: List[str] = []
        span_rows: List[Optional[list]] = [] if keep_spans else None

        for html in batch.column("html").to_pylist():
            kept_spans: list = []
            if html is None:
                status_col.append("error")
                error_col.append("null-payload")
                doctype_col.append("")
                encoding_col.append("")
                texts.append("")
                n_blocks.append(0)
                if keep_spans:
                    span_rows.append(kept_spans)
                continue
            encoding = "utf-8"
            if html[:5] == _PDF_MAGIC:
                doctype_col.append("pdf")
            else:
                try:
                    # ASCII fast path: bytes.isascii() is an allocation-free
                    # C scan, and ASCII is valid UTF-8 by construction — the
                    # strict decode below otherwise materializes (and
                    # immediately frees) a payload-sized str per document
                    # purely for validation, the kind of DRAM churn that
                    # inflates per-doc CPU at 32-wide (BASELINE.md).
                    if not html.isascii():
                        html.decode("utf-8", "strict")
                except UnicodeDecodeError:
                    # declared charset first (<meta charset=...> sniff,
                    # stages/segment.sniff_charset), then the configured
                    # legacy fallback, else deterministic quarantine
                    from webextract.stages.segment import sniff_charset

                    sniffed = sniff_charset(html)
                    if sniffed is not None:
                        try:
                            html.decode(sniffed, "strict")
                            encoding = sniffed
                        except UnicodeDecodeError:
                            sniffed = None
                    if encoding == "utf-8":
                        if cfg.fallback_encoding:
                            encoding = str(cfg.fallback_encoding)
                        else:
                            status_col.append("error")
                            error_col.append("utf8-decode")
                            doctype_col.append("")
                            encoding_col.append("")
                            texts.append("")
                            n_blocks.append(0)
                            if keep_spans:
                                span_rows.append(kept_spans)
                            continue
                doctype_col.append("html")
            status_col.append("ok")
            error_col.append("")
            encoding_col.append(encoding)
            parts: List[str] = []
            for span in segment_html(html, cfg):
                if span["score"] < drop_score:
                    continue
                t = decode_span(html, span["start"], span["end"], span["kind"],
                                encoding)
                if t:
                    parts.append(t)
                    if keep_spans:
                        kept_spans.append(span)
            texts.append("\n".join(parts))
            n_blocks.append(len(parts))
            if keep_spans:
                span_rows.append(kept_spans)

        out = batch.drop_columns(["html"])
        if keep_spans:
            out = out.append_column(
                "spans", pa.array(span_rows, type=_SPANS_TYPE)
            )
        out = (
            out.append_column("status", pa.array(status_col, type=pa.string()))
            .append_column("error", pa.array(error_col, type=pa.string()))
            .append_column("doctype", pa.array(doctype_col, type=pa.string()))
            .append_column("encoding", pa.array(encoding_col, type=pa.string()))
            .append_column("extracted_text", pa.array(texts, type=pa.string()))
            .append_column("n_blocks", pa.array(n_blocks, type=pa.int32()))
        )
        names = out.column_names
        if "text" in names:
            out = out.rename_columns(
                ["gold_text" if n == "text" else n for n in names]
            )
        return out.rename_columns(
            ["text" if n == "extracted_text" else n for n in out.column_names]
        )


def extract_pages(
    ds: "ray.data.Dataset",
    *,
    cfg: Optional[SegmentConfig] = None,
    drop_score: float = 0.5,
    batch_size: int = 256,
    fused: bool = True,
    concurrency: Concurrency = (1, 8),
    segment_concurrency: Concurrency = None,
    extract_concurrency: Concurrency = None,
    keep_spans: bool = False,
) -> "ray.data.Dataset":
    """pages Dataset (url, warc_ts, html, [text], lang, ...) -> results.

    Output columns: input passthrough (gold slot renamed `gold_text`) plus
    `text` (extracted), `n_blocks`, `status`, `error`, `doctype`
    (schema.OUTPUT_FIELDS). Lazy — caller consumes via write/iter/aggregate.

    `fused=True` (default): one pool running detect+extract+assemble per
    batch — the throughput path. `concurrency=None` runs it as a TASK pool
    (stateless fused kernel, no per-actor state to warm): every CPU slot
    does read/extract/write interchangeably, which measured both faster at
    full width (17.8 s vs 24.4 s per 800k docs at 32 cpus) and more
    consistent — actors reserve CPUs and need ramp + headroom sizing.
    `fused=False`: one actor pool per stage (`segment_concurrency` /
    `extract_concurrency`), the reference's deploy-pipeline topology; size
    the pools to leave CPU headroom for the read/write task stages or the
    job will starve.
    """
    if fused and segment_concurrency is None and extract_concurrency is None:
        if concurrency is None:
            # task pool: ship one tiny configured instance inside a plain fn
            ext = FusedExtractor(cfg=cfg, drop_score=drop_score,
                                 keep_spans=keep_spans)
            return ds.map_batches(
                lambda b, _e=ext: _e(b),
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        return ds.map_batches(
            FusedExtractor,
            fn_constructor_kwargs={
                "cfg": cfg, "drop_score": drop_score, "keep_spans": keep_spans,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return _staged(ds, cfg=cfg, drop_score=drop_score, batch_size=batch_size,
                   concurrency=concurrency,
                   segment_concurrency=segment_concurrency,
                   extract_concurrency=extract_concurrency,
                   keep_spans=keep_spans)


def extract_pages_tiered(
    ds: "ray.data.Dataset",
    *,
    giant_bytes: int = 1_000_000,
    giant_batch_size: int = 4,
    **kwargs,
) -> "ray.data.Dataset":
    """Skew-hardened variant: route giant pages to a batch_size-limited pool.

    One multi-MB page in a 256-row batch makes the whole batch a straggler
    and balloons the worker heap (SURVEY.md §4 skew row; the reference
    splits many-crop images into independently processed chunks,
    `rec_pre_node.py:43-57`). Here rows are split by payload size into two
    sub-pipelines — normal batches vs tiny batches — and unioned; both use
    the same extractor, so results are identical to the untiered run.
    """
    import pyarrow as _pa
    import pyarrow.compute as _pc

    def tag(batch):
        return batch.append_column(
            "_sz", _pc.binary_length(batch.column("html")).cast(_pa.int64())
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    small = tagged.filter(expr=f"_sz < {giant_bytes}").drop_columns(["_sz"])
    giant = tagged.filter(expr=f"_sz >= {giant_bytes}").drop_columns(["_sz"])
    out_small = extract_pages(small, **kwargs)
    giant_kwargs = dict(kwargs)
    giant_kwargs["batch_size"] = giant_batch_size
    out_giant = extract_pages(giant, **giant_kwargs)
    return out_small.union(out_giant)


def _staged(ds, *, cfg, drop_score, batch_size, concurrency,
            segment_concurrency, extract_concurrency, keep_spans):
    ds = ds.map_batches(
        BlockSegmenter,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=segment_concurrency or concurrency,
    )
    ds = ds.map_batches(
        SpanExtractor,
        fn_constructor_kwargs={"drop_score": drop_score},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=extract_concurrency or concurrency,
    )
    return ds.map_batches(
        functools.partial(assemble_batch, keep_spans=keep_spans),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def read_extract_pages(
    path: str,
    *,
    cfg: Optional[SegmentConfig] = None,
    drop_score: float = 0.5,
    batch_size: int = 512,
    columns=("url", "warc_ts", "html", "lang"),
    keep_spans: bool = False,
    split_row_groups: bool = False,
) -> "ray.data.Dataset":
    """SOURCE-FUSED extraction: one task per input Parquet ROW GROUP that
    reads, extracts AND emits compact results — the raw `html` payloads
    never enter the object store at all (the standard path round-trips
    ~2x the payload bytes through plasma between the read and map
    stages; at 32-wide that shared-memory traffic is the measured
    throughput wall: 39k docs/s standard vs 67k fused on the 2.4M-doc
    tier).

    Work items are (file, row_group) pairs, so parallelism = total row
    groups, not file count — finer task granularity smooths the last
    scheduling wave, and each task's memory is bounded by one row group
    regardless of file size. Listing row groups costs one metadata read
    per file at plan time (footer only, not data). Identical output rows
    to the staged path (pytest-pinned).
    """
    import os as _os

    import pyarrow.parquet as _pq

    if _os.path.isdir(path):
        files = sorted(
            _os.path.join(path, f)
            for f in _os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    ext = FusedExtractor(cfg=cfg, drop_score=drop_score, keep_spans=keep_spans)
    cols = list(columns)

    items = []
    for p in files:
        if split_row_groups:
            n_rg = _pq.read_metadata(p).num_row_groups
            items.extend({"path": p, "rg": i} for i in range(max(1, n_rg)))
        else:
            items.append({"path": p, "rg": -1})

    def read_extract(batch):
        for p, rg in zip(batch.column("path").to_pylist(),
                         batch.column("rg").to_pylist()):
            pf = _pq.ParquetFile(p)
            kw = {} if rg < 0 else {"row_groups": [rg]}
            for rb in pf.iter_batches(batch_size=batch_size, columns=cols,
                                      **kw):
                yield ext(pa.Table.from_batches([rb]))

    paths = ray.data.from_items(items, override_num_blocks=len(items))
    return paths.map_batches(read_extract, batch_format="pyarrow",
                             batch_size=1)


def extract_one(
    html: bytes,
    *,
    cfg: Optional[SegmentConfig] = None,
    drop_score: float = 0.5,
) -> str:
    """Driver-side single-document reference path (serial oracle, the
    `predict_system.py` analog) — used by tests to pin pipeline semantics."""
    cfg = cfg or SegmentConfig()
    encoding = "utf-8"
    try:
        if html[:5] != b"%PDF-":
            html.decode("utf-8", "strict")
    except UnicodeDecodeError:
        # declared-charset sniff, same rule as the batch paths
        from webextract.stages.segment import sniff_charset

        encoding = sniff_charset(html)
        if encoding is None:
            return ""
        try:
            html.decode(encoding, "strict")
        except UnicodeDecodeError:
            return ""
    texts = []
    for span in segment_html(html, cfg):
        if span["score"] < drop_score:
            continue
        t = decode_span(html, span["start"], span["end"], span["kind"],
                        encoding)
        if t:
            texts.append(t)
    return "\n".join(texts)
