"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship detect-then-extract pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible one (same column names — the driver hashes values after
sorting columns by name).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

The flagship queries derive a BASELINE-shaped pages table
(url, warc_ts, html, text, lang) deterministically from the driver's
``documents`` table (webextract/corpus.py render; FIXTURES.md §1), extract
main content through the full Ray pipeline, and the oracle reconstructs the
expected byte-exact text in pure SQL — mirroring
``corpus.split_paragraphs``: k = doc_id%3+1 word-chunks (5 for
three-column rows), '\\n'-joined.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

def _conc():
    """Actor-pool bounds for the oracle queries: (1, 4) measured-best.

    A wider cap (tried (1, 16) at 32 cpus) made every secondary SLOWER at
    the sf0.1 tier — actor ramp latency dominates these short runs and the
    extra pools starve task stages. Override via RAY_GRAFT_QUERY_CONC for
    experiments on bigger corpora."""
    import os

    return (1, int(os.environ.get("RAY_GRAFT_QUERY_CONC", "4")))


def _docs(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)
