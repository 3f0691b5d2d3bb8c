"""URL canonicalization + canonical-URL dedup.

The reference normalizes recognized text against dictionary rules before
comparing/deduplicating (`mindocr/postprocess/rec_postprocess.py:60-120`
lowercase + filter-to-charset); the web-corpus analog every crawl pipeline
needs is URL normalization: the same page arrives under `HTTPS://Host...`,
`...:443/...`, `...?utm_source=...` and `...#fragment` variants, and
keep-one-per-canonical-url is the first dedup a 100 TB crawl runs.

Canonicalization rules (each mirrored by the SQL oracle independently,
string ops on the same raw url):

1. strip the fragment (everything from the first ``#``)
2. lowercase the scheme and the host[:port]
3. drop a default port (``:443`` for https, ``:80`` for http)
4. empty path becomes ``/``
5. drop ``utm_*`` tracking params and empty params from the query,
   preserving the order of what remains; drop the ``?`` when nothing does

`dedup_by_url` then keeps ONE row per canonical url (the max of an order
column, i.e. keep-newest). Scale shape: the groupby shuffles only
``(canon_url, order)`` pairs — never page payloads — matching the
keys-only winner discipline of `functions/dedup.exact_dedup`.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa


def canonicalize_url(url: str) -> str:
    """Canonicalize one URL by the five rules above. Non-absolute inputs
    (no ``://``) are returned fragment-stripped but otherwise untouched."""
    u = url.split("#", 1)[0]
    if "://" not in u:
        return u
    scheme, rest = u.split("://", 1)
    scheme = scheme.lower()
    # hostport ends at the EARLIEST of '/' and '?': a host-only url with a
    # query ('https://Host?utm_source=x') must not fold the query into the
    # host (round-3 ADVICE fix; exercised by the doc_id%11 messy variant).
    cuts = [i for i in (rest.find("/"), rest.find("?")) if i >= 0]
    if not cuts:
        hostport, pathq = rest, ""
    else:
        cut = min(cuts)
        hostport, pathq = rest[:cut], rest[cut:]
    hostport = hostport.lower()
    if scheme == "https" and hostport.endswith(":443"):
        hostport = hostport[:-4]
    elif scheme == "http" and hostport.endswith(":80"):
        hostport = hostport[:-3]
    if "?" in pathq:
        path, query = pathq.split("?", 1)
    else:
        path, query = pathq, ""
    if not path:
        path = "/"
    params = [p for p in query.split("&") if p and not p.startswith("utm_")]
    if params:
        return f"{scheme}://{hostport}{path}?{'&'.join(params)}"
    return f"{scheme}://{hostport}{path}"


def canonicalize_batch(batch: pa.Table, *, url_col: str = "url",
                       out_col: str = "canon_url") -> pa.Table:
    """Append a canonical-url column. Per-row Python over short url
    strings (bounded work per row; the payload columns pass through
    zero-copy)."""
    canon: List[str] = [
        canonicalize_url(u) if u is not None else None
        for u in batch.column(url_col).to_pylist()
    ]
    return batch.append_column(out_col, pa.array(canon, type=pa.string()))


def dedup_by_url(ds, *, url_col: str = "url", order_col: str,
                 keep: str = "max"):
    """One row per canonical url: keep the row with the max (``keep="max"``,
    i.e. newest) or min ``order_col``. Returns (canon_url, order_col).

    Only ``(canon_url, order_col)`` crosses the shuffle; retrieve full
    payload rows afterwards with `functions.dedup.winner_filter` if needed
    (same two-step discipline as `q_dedup_docs_rows`).
    """
    assert keep in ("max", "min")

    def keys(batch: pa.Table) -> pa.Table:
        b = canonicalize_batch(batch, url_col=url_col)
        return b.select(["canon_url", order_col])

    # per-url MAX/MIN is a plain vectorized hash aggregate — the former
    # per-url map_groups paid one Python call per distinct canonical url
    from ray.data.aggregate import Max, Min

    agg = (Max if keep == "max" else Min)(order_col, alias_name=order_col)
    out = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("canon_url")
        .aggregate(agg)
    )

    def retype(b: pa.Table) -> pa.Table:
        # pin the (canon_url, order_col) int64 contract (Ray's Max/Min
        # can widen to double on some inputs; empty blocks re-typed)
        if b.num_rows == 0:
            return pa.schema([("canon_url", pa.string()),
                              (order_col, pa.int64())]).empty_table()
        return pa.table({
            "canon_url": b.column("canon_url"),
            order_col: b.column(order_col).cast(pa.int64()),
        })

    return out.map_batches(retype, batch_format="pyarrow")
