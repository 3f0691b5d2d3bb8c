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
    import functools

    return ds.groupby("user_id").map_groups(
        functools.partial(sessionize_group, gap_minutes=gap_minutes),
        batch_format="pyarrow",
    )
