"""Event sessionization: gap-based sessions per user.

The one genuinely order-sensitive streaming-ish operator (the reference has
no event-time semantics at all, SURVEY.md §2.9): events are grouped per
user (`groupby(user_id).map_groups` — the shuffle moves only event rows),
sorted by (ts, event_id) inside the group, and split into sessions wherever
the gap exceeds `gap_minutes`. Deterministic tie-break on event_id keeps
the result byte-stable under any parallelism.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa


def sessionize_group(group: pa.Table, *, gap_minutes: int = 30) -> pa.Table:
    """One user's events -> session summary rows (session_idx is 0-based in
    time order)."""
    ts = group.column("ts").cast(pa.int64()).to_numpy()  # us since epoch
    eid = group.column("event_id").to_numpy()
    order = np.lexsort((eid, ts))
    ts, eid = ts[order], eid[order]
    gap_us = gap_minutes * 60 * 1_000_000
    new_session = np.ones(len(ts), dtype=np.int64)
    if len(ts) > 1:
        new_session[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
    sess = np.cumsum(new_session) - 1
    user = group.column("user_id")[0].as_py()
    n_sessions = int(sess[-1]) + 1 if len(sess) else 0
    out_user: List[int] = []
    out_idx: List[int] = []
    out_n: List[int] = []
    out_first: List[int] = []
    out_last: List[int] = []
    for s in range(n_sessions):
        m = sess == s
        out_user.append(user)
        out_idx.append(s)
        out_n.append(int(m.sum()))
        out_first.append(int(eid[m].min()))
        out_last.append(int(eid[m].max()))
    return pa.table(
        {
            "user_id": pa.array(out_user, type=pa.int64()),
            "session_idx": pa.array(out_idx, type=pa.int64()),
            "n_events": pa.array(out_n, type=pa.int64()),
            "first_event": pa.array(out_first, type=pa.int64()),
            "last_event": pa.array(out_last, type=pa.int64()),
        }
    )


def sessionize(ds, *, gap_minutes: int = 30):
    """Round-5 shape: ONE `partition_apply` exchange by user_id with a
    fully vectorized per-partition pass (the former
    ``groupby(user_id).map_groups`` paid one Python call PER USER).
    All of a partition's users sessionize in one numpy lexsort +
    reduceat sweep: session breaks where the user changes or the gap
    exceeds the threshold, per-session aggregates via ``reduceat`` over
    the break offsets — identical rows to :func:`sessionize_group`."""
    from webextract.functions.joins import partition_apply

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("session_idx", pa.int64()),
        ("n_events", pa.int64()), ("first_event", pa.int64()),
        ("last_event", pa.int64()),
    ])

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "ts_us": b.column("ts").cast(pa.int64()),
            "event_id": b.column("event_id").cast(pa.int64()),
        })

    def per_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        s = t.column("ts_us").to_numpy(zero_copy_only=False)
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, s, u))
        u, s, e = u[order], s[order], e[order]
        user_break = np.r_[True, u[1:] != u[:-1]]
        new_sess = user_break | np.r_[True, (s[1:] - s[:-1]) > gap_us]
        starts = np.nonzero(new_sess)[0]
        n_sess = starts.size
        counts = np.r_[starts[1:], u.size] - starts
        # per-user 0-based session ordinal: sessions are emitted in
        # (user, time) order, so rank-within-user-run over the session
        # start rows is the session_idx
        usb = user_break[starts]
        ustarts = np.nonzero(usb)[0]
        ucounts = np.r_[ustarts[1:], n_sess] - ustarts
        session_idx = (np.arange(n_sess, dtype=np.int64)
                       - np.repeat(ustarts, ucounts))
        return pa.table({
            "user_id": pa.array(u[starts], type=pa.int64()),
            "session_idx": pa.array(session_idx, type=pa.int64()),
            "n_events": pa.array(counts, type=pa.int64()),
            "first_event": pa.array(np.minimum.reduceat(e, starts),
                                    type=pa.int64()),
            "last_event": pa.array(np.maximum.reduceat(e, starts),
                                   type=pa.int64()),
        }, schema=out_schema)

    return partition_apply(
        ds.map_batches(to_us, batch_format="pyarrow"), per_part,
        on="user_id",
        schema=pa.schema([("user_id", pa.int64()), ("ts_us", pa.int64()),
                          ("event_id", pa.int64())]),
        out_schema=out_schema)
