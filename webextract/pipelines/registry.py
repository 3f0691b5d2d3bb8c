"""Named-operator registry + config-driven pipeline compiler.

The reference instantiates YAML transform chains by `eval(name)(**params)`
(`mindocr/data/transforms/transforms_factory.py:23-57`; same pattern for
postprocess and datasets). Here the registry is an explicit dict — no eval
of config strings — and a pipeline spec is a list of
`{"op": name, **params}` dicts compiled onto a Dataset:

    spec = [
        {"op": "segment", "concurrency": 8},
        {"op": "extract", "drop_score": 0.5},
        {"op": "assemble"},
    ]
    ds = build_pipeline(ds, spec)

Ops register with :func:`register`; each op is a function
`(ds, **params) -> ds` so any Dataset verb (map_batches chains, groupbys,
filters) can hide behind a name.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

_REGISTRY: Dict[str, Callable] = {}


def register(name: str) -> Callable:
    def deco(fn: Callable) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"operator {name!r} already registered")
        _REGISTRY[name] = fn
        return fn

    return deco


def get_op(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown operator {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def list_ops() -> List[str]:
    return sorted(_REGISTRY)


def build_pipeline(ds, spec: List[Dict[str, Any]]):
    """Compile a spec (list of {"op": name, **params}) onto a Dataset."""
    for step in spec:
        params = dict(step)
        name = params.pop("op")
        ds = get_op(name)(ds, **params)
    return ds


# --- built-in operator registrations ----------------------------------------


@register("segment")
def _op_segment(ds, *, batch_size: int = 256, concurrency=(1, 8),
                strategy: str = "db", **cfg_kwargs):
    from webextract.stages.segment import BlockSegmenter, SegmentConfig

    cfg = SegmentConfig(**cfg_kwargs) if cfg_kwargs else None
    return ds.map_batches(
        BlockSegmenter,
        fn_constructor_kwargs={"cfg": cfg, "strategy": strategy},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


@register("extract")
def _op_extract(ds, *, drop_score: float = 0.5, batch_size: int = 256,
                concurrency=(1, 8)):
    from webextract.stages.extract import SpanExtractor

    return ds.map_batches(
        SpanExtractor,
        fn_constructor_kwargs={"drop_score": drop_score},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


@register("assemble")
def _op_assemble(ds, *, keep_spans: bool = False, batch_size: int = 256):
    import functools

    from webextract.stages.assemble import assemble_batch

    return ds.map_batches(
        functools.partial(assemble_batch, keep_spans=keep_spans),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


@register("filter")
def _op_filter(ds, *, expr: str):
    return ds.filter(expr=expr)


@register("select")
def _op_select(ds, *, columns: List[str]):
    return ds.select_columns(columns)


@register("limit")
def _op_limit(ds, *, n: int):
    return ds.limit(n)


@register("repartition")
def _op_repartition(ds, *, num_blocks: int, shuffle: bool = False):
    return ds.repartition(num_blocks, shuffle=shuffle)


@register("salted_repartition")
def _op_salted_repartition(ds, *, key: str = "url", num_blocks: int = 64,
                           salt_buckets: int = 16, key_extract: str = None,
                           subkey: str = None, strategy: str = "sort"):
    """Skew defense: DETERMINISTIC hash partition on (key, salt).

    Every row gets a transient partition value whose HIGH bits are a
    well-mixed hash of ``(partition_key, crc32(subkey) % salt_buckets)`` and
    whose LOW bits order rows totally (crc32 of the subkey), then the
    dataset is range-partitioned on it (``sort("_salt")`` + coalescing
    ``repartition(num_blocks)``). A hot key's rows land in exactly
    `salt_buckets` distinct hash regions spread uniformly over the 32-bit
    space instead of one (SURVEY.md §4 skew row; the reference splits
    many-crop images into independently processed chunks,
    `rec_pre_node.py:43-57`). The low-bit total order makes the final
    row->block assignment independent of sort-tie placement.

    * `key_extract`: optional regex with ONE capture group applied to the key
      column to derive the partition key (e.g. ``https://([^/]+)/`` buckets
      by crawl host — the hot-host case).
    * `subkey`: column providing the per-row salt component (defaults to the
      raw `key` column, which is unique for url-keyed tables).
    * `strategy`: ``"sort"`` (default) range-partitions via a global sort on
      the salt — rows get a byte-stable TOTAL order, so block contents AND
      intra-block row order are identical across runs. ``"hash"`` uses
      Ray's hash-shuffle repartition on the salt column (one all-to-all,
      no sort): partition CONTENTS are still a pure function of row bytes
      (salt -> partition is Ray's stable hash), but intra-block row order
      follows block arrival — prefer it at 100 TB where the sort's extra
      exchange dominates and downstream ops are order-insensitive.

    Everything is a pure function of row content — byte-identical partition
    assignment across runs (the resume-determinism contract, SURVEY.md §7.4).
    """
    import re
    import zlib

    import pyarrow as pa

    subkey_col = subkey or key
    if key_extract is not None:
        pat = re.compile(key_extract)
        if "k" not in pat.groupindex and pat.groups != 1:
            # Naive '(' -> '(?P<k>' rewriting corrupted escaped parens and
            # non-capture groups (round-2 ADVICE); demand an unambiguous
            # pattern instead.
            raise ValueError(
                "salted_repartition: key_extract must contain exactly one "
                "capture group or a named group (?P<k>...)"
            )
        grp = "k" if "k" in pat.groupindex else 1
    else:
        pat = grp = None

    def add_salt(batch: pa.Table) -> pa.Table:
        keys = batch.column(key)
        if pat is not None:
            pkeys = []
            for v in keys.to_pylist():
                m = pat.search(str(v))
                # non-matching rows keep the RAW key (previously they all
                # collapsed into the single partition key 'None')
                pkeys.append(m.group(grp) if m else v)
        else:
            pkeys = keys.to_pylist()
        subs = batch.column(subkey_col).to_pylist()
        salts = []
        for k, s in zip(pkeys, subs):
            sub_h = zlib.crc32(str(s).encode("utf-8"))
            region = zlib.crc32(
                str(k).encode("utf-8") + b"\x00" + str(sub_h % salt_buckets).encode()
            )
            salts.append((region << 31) | (sub_h >> 1))  # 63-bit, total order
        return batch.append_column("_salt", pa.array(salts, type=pa.int64()))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    if strategy == "hash":
        import copy

        from ray.data.context import ShuffleStrategy

        out = salted.repartition(num_blocks, keys=["_salt"])
        # The planner validates keyed repartition against the PLAN's
        # captured DataContext (shared object up the whole lineage chain),
        # not the thread-local one — give this plan its own copy so the
        # hash strategy applies here without leaking to the caller's
        # dataset or to the global context.
        out._plan._context = copy.deepcopy(out._plan._context)
        out._plan._context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        return out.drop_columns(["_salt"])
    if strategy != "sort":
        raise ValueError(f"salted_repartition: unknown strategy={strategy!r}")
    return salted.sort("_salt").repartition(num_blocks).drop_columns(["_salt"])


@register("minhash")
def _op_minhash(ds, *, text_col: str = "text", num_perm: int = 64,
                bands: int = 8, k: int = 3, concurrency=(1, 4)):
    from webextract.functions.dedup import MinHasher

    return ds.map_batches(
        MinHasher(num_perm=num_perm, k=k, bands=bands, text_col=text_col),
        batch_format="pyarrow",
    )


@register("simhash")
def _op_simhash(ds, *, text_col: str = "text"):
    import functools

    from webextract.functions.dedup import simhash_batch

    return ds.map_batches(
        functools.partial(simhash_batch, text_col=text_col),
        batch_format="pyarrow",
    )


@register("quality_stats")
def _op_quality(ds, *, text_col: str = "text"):
    import functools

    from webextract.functions.textstats import quality_stats_batch

    return ds.map_batches(
        functools.partial(quality_stats_batch, text_col=text_col),
        batch_format="pyarrow",
    )


@register("lang_id")
def _op_lang_id(ds, *, text_col: str = "text"):
    import functools

    from webextract.functions.textstats import lang_id_batch

    return ds.map_batches(
        functools.partial(lang_id_batch, text_col=text_col),
        batch_format="pyarrow",
    )


@register("fingerprint")
def _op_fingerprint(ds, *, text_col: str = "text"):
    import functools

    from webextract.functions.textstats import fingerprint_batch

    return ds.map_batches(
        functools.partial(fingerprint_batch, text_col=text_col),
        batch_format="pyarrow",
    )


@register("classify")
def _op_classify(ds, *, text_col: str = "text", concurrency=(1, 4)):
    from webextract.stages.classify import LangClassifier

    return ds.map_batches(
        LangClassifier,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


@register("chunk")
def _op_chunk(ds, *, max_tokens: int = 64, id_col: str = "doc_id",
              text_col: str = "text"):
    from webextract.functions.chunking import chunk_documents

    return chunk_documents(ds, max_tokens=max_tokens, id_col=id_col,
                           text_col=text_col)


@register("sessionize")
def _op_sessionize(ds, *, gap_minutes: int = 30):
    from webextract.functions.sessions import sessionize

    return sessionize(ds, gap_minutes=gap_minutes)


@register("table_decode")
def _op_table_decode(ds, *, html_col: str = "html", explode: bool = False,
                     id_col: str = "doc_id"):
    import functools

    from webextract.stages.tables import decode_tables_batch, explode_cells

    if explode:
        fn = functools.partial(explode_cells, id_col=id_col, html_col=html_col)
    else:
        fn = functools.partial(decode_tables_batch, html_col=html_col)
    return ds.map_batches(fn, batch_format="pyarrow")


@register("cell_match")
def _op_cell_match(ds, **kwargs):
    import functools

    from webextract.functions.matcher import match_cells_batch

    return ds.map_batches(
        functools.partial(match_cells_batch, **kwargs), batch_format="pyarrow"
    )


@register("image_decode")
def _op_image_decode(ds, *, strict: bool = False, batch_size: int = 16,
                     concurrency=(1, 4), payload_col: str = "image"):
    from webextract.stages.multimodal import ImageDecoder

    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"strict": strict, "payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payload bytes x batch must fit heap
        concurrency=concurrency,
    )


@register("seeded_augment")
def _op_seeded_augment(ds, *, text_col: str = "text", key_col: str = "url",
                       drop_rate: float = 0.1):
    """Deterministic per-row augmentation (the training-time random-aug
    family's PATTERN, `svtr_transform.py:57-1072` — ~30 randomized ops):
    every random draw is keyed on a stable hash of (key, position), so the
    augmented output is identical across runs/workers — the engine's
    no-RNG determinism contract (SURVEY.md §7.4). This op does seeded word
    dropout; any photometric/geometric analog plugs in the same way.
    """
    import pyarrow as pa

    from webextract.corpus import mix

    threshold = int(drop_rate * (1 << 32))

    def aug(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out = []
        for k, t in zip(keys, texts):
            seed = mix(hash_key(k), 77)
            words = (t or "").split(" ")
            kept = [w for i, w in enumerate(words)
                    if mix(seed, i) & 0xFFFFFFFF >= threshold]
            out.append(" ".join(kept))
        return batch.append_column(
            "augmented_text", pa.array(out, type=pa.string())
        )

    def hash_key(k) -> int:
        import zlib

        return zlib.crc32(str(k).encode("utf-8"))

    return ds.map_batches(aug, batch_format="pyarrow")


@register("length_bucket")
def _op_length_bucket(ds, *, col: str = "html", batch_size: int = 256):
    """Gear-style length bucketing (`gear_utils.py:28-36` analog): sort rows
    by payload length WITHIN each batch so downstream fixed-size batches see
    similar-length rows (less tail latency per batch), without any global
    sort/shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def bucket(batch: pa.Table) -> pa.Table:
        lens = pc.binary_length(batch.column(col)) \
            if pa.types.is_binary(batch.schema.field(col).type) \
            else pc.utf8_length(batch.column(col))
        idx = pc.sort_indices(lens)
        return batch.take(idx)

    return ds.map_batches(bucket, batch_format="pyarrow",
                          batch_size=batch_size)


def load_spec(path: str) -> List[Dict[str, Any]]:
    """Load a pipeline spec from a JSON (or, when available, YAML) file —
    the reference's config-driven chain surface
    (`configs/det/dbnet/db_r50_icdar15.yaml:66-120` transform lists)
    WITHOUT eval-by-name: unknown op names raise at build time, not run
    time. The file holds exactly the list `build_pipeline` accepts:

        [{"op": "segment", "strategy": "db"},
         {"op": "extract", "drop_score": 0.5},
         {"op": "assemble"}]
    """
    import json

    with open(path) as f:
        text = f.read()
    try:
        spec = json.loads(text)
    except json.JSONDecodeError:
        try:
            import yaml  # optional — not guaranteed in every container
        except ImportError as e:  # pragma: no cover
            raise ValueError(
                f"{path} is not JSON and PyYAML is unavailable"
            ) from e
        spec = yaml.safe_load(text)
    if not isinstance(spec, list):
        raise ValueError(f"pipeline spec must be a LIST of op dicts: {path}")
    for step in spec:
        get_op(step["op"])  # fail fast on unknown names
    return spec


def build_pipeline_from_file(ds, path: str):
    return build_pipeline(ds, load_spec(path))
