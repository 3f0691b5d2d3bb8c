"""Sources: the `pages` table reader and the documents->pages deriver.

The reference reads `img\\tjson` annotation files plus an image dir
(`mindocr/data/det_dataset.py:114-146`); our source is Parquet shards of
(url, warc_ts, html, text, lang) — `ray.data.read_parquet` with column
pruning pushed to the read (only needed columns leave storage).
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import ray.data

from webextract import corpus

def read_pages(
    path: str, *, columns: Optional[List[str]] = None, **kwargs
) -> "ray.data.Dataset":
    """Read a pages Parquet directory/file, pruning columns at the read."""
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_pages_fast(
    path: str, *, columns: Optional[List[str]] = None
) -> "ray.data.Dataset":
    """Parquet read as one Ray task per file, decoding via pyarrow directly.

    Ray's generic fragment reader costs ~10x the CPU of a plain
    `pq.read_table` on these wide binary-payload rows (measured round 1);
    for the throughput path we map over the file list ourselves: the driver
    lists files (cheap at any scale), each task opens ONE file and yields
    one Arrow table per ROW GROUP — memory stays bounded no matter how big
    a single shard file is, and Ray's dynamic block splitting re-chunks
    oversized outputs. Column pruning is pushed into the row-group read.

    Trade-off vs `read_pages`: no path partitioning/filters or
    include_paths; use the generic reader where those matter (lineage).
    """
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        files = [path]

    def load(batch: pa.Table):
        for p in batch.column("path").to_pylist():
            pf = pq.ParquetFile(p)
            for rg in range(pf.num_row_groups):
                yield pf.read_row_group(rg, columns=columns)

    paths = ray.data.from_items(
        [{"path": p} for p in files], override_num_blocks=len(files)
    )
    return paths.map_batches(load, batch_format="pyarrow", batch_size=1)


def _render_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> pages rows (deterministic render; corpus.py)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls, ts, htmls, golds = [], [], [], []
    for doc_id, text, lang in zip(doc_ids, texts, langs):
        urls.append(corpus.url_of(doc_id))
        ts.append(corpus.ts_of(doc_id))
        htmls.append(corpus.render_page(doc_id, text, lang))
        golds.append(corpus.gold_text(text, doc_id))
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.int64()),
            pa.array(urls, type=pa.string()),
            pa.array(ts, type=pa.timestamp("us")),
            pa.array(htmls, type=pa.binary()),
            pa.array(golds, type=pa.string()),
            pa.array(langs, type=pa.string()),
        ],
        names=["doc_id", "url", "warc_ts", "html", "text", "lang"],
    )


def pages_from_documents(sf_dir: str, *, batch_size: int = 256) -> "ray.data.Dataset":
    """Derive the BASELINE-shaped pages table from the driver's documents
    table (deterministic at any scale; keeps `doc_id` as a join key)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(
        _render_batch, batch_format="pyarrow", batch_size=batch_size
    )


def read_pages_glob(path: str, *, file_extensions=("html", "htm")) -> "ray.data.Dataset":
    """Label-less raw-document glob source (PredictDataset analog,
    `mindocr/data/predict_dataset.py:14-81`: glob an image dir, no labels).

    Reads every matching file as one pages-shaped row: url = file path,
    html = raw bytes, text = '' (no gold), lang = 'und'. Downstream
    pipelines run unchanged; the verify pass is simply inapplicable.
    """
    ds = ray.data.read_binary_files(
        path, include_paths=True, file_extensions=list(file_extensions)
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        import datetime

        n = batch.num_rows
        epoch = datetime.datetime(1970, 1, 1)
        return pa.table(
            {
                "url": batch.column("path").cast(pa.string()),
                "warc_ts": pa.array([epoch] * n, type=pa.timestamp("us")),
                "html": batch.column("bytes").cast(pa.binary()),
                "text": pa.array([""] * n, type=pa.string()),
                "lang": pa.array(["und"] * n, type=pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def _coerce_pages_batch(batch: pa.Table) -> pa.Table:
    """Normalize a loosely-typed pages batch (JSONL/CSV sources) to the
    canonical schema: url string, warc_ts timestamp[us] (int = epoch
    seconds accepted), html binary (utf-8 encodes a string payload),
    text/lang strings with '' / 'und' defaults."""
    import datetime

    n = batch.num_rows
    cols = set(batch.column_names)

    url = batch.column("url").cast(pa.string())
    if "warc_ts" in cols:
        ts = batch.column("warc_ts")
        if pa.types.is_integer(ts.type):
            import pyarrow.compute as _pc

            ts = _pc.multiply(ts.cast(pa.int64()), 1_000_000).cast(
                pa.timestamp("us"))
        else:
            ts = ts.cast(pa.timestamp("us"))
    else:
        ts = pa.array([datetime.datetime(1970, 1, 1)] * n,
                      type=pa.timestamp("us"))
    html = batch.column("html")
    if pa.types.is_string(html.type) or pa.types.is_large_string(html.type):
        html = html.cast(pa.string()).cast(pa.binary())
    else:
        html = html.cast(pa.binary())
    text = (batch.column("text").cast(pa.string()) if "text" in cols
            else pa.array([""] * n, type=pa.string()))
    lang = (batch.column("lang").cast(pa.string()) if "lang" in cols
            else pa.array(["und"] * n, type=pa.string()))
    return pa.table({"url": url, "warc_ts": ts, "html": html,
                     "text": text, "lang": lang})


def read_pages_jsonl(path: str) -> "ray.data.Dataset":
    """JSONL pages source (one JSON object per line with at least
    url + html; warc_ts may be epoch seconds): the crawl-sidecar format
    WARC post-processors commonly emit. Ray's native JSON reader splits
    files into blocks; the coercion map normalizes to the canonical
    pages schema so every downstream pipeline runs unchanged."""
    ds = ray.data.read_json(path)
    return ds.map_batches(_coerce_pages_batch, batch_format="pyarrow")


def read_pages_csv(path: str) -> "ray.data.Dataset":
    """CSV pages source (header row with url,html[,warc_ts,text,lang]).
    html arrives as a string column and is utf-8 encoded to binary by
    the coercion map — binary payloads with embedded delimiters belong
    in parquet/JSONL, which is why this source is for text-only
    exports."""
    ds = ray.data.read_csv(path)
    return ds.map_batches(_coerce_pages_batch, batch_format="pyarrow")
