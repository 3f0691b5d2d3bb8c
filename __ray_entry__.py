"""Driver contract for the graft builder (Ray Data target) — thin shim.

``entry()`` runs the flagship detect-then-extract pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible one (same column names — the driver hashes values after
sorting columns by name).

The implementation lives in ``webextract/queries/`` (one module per query
domain; see that package's ``__init__``); this shim re-exports the whole
historical surface so ``import __ray_entry__`` keeps working for the
driver, ``bench.py`` and the tests.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in webextract.queries) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from webextract.queries import *  # noqa: F401,F403
from webextract.queries import (  # noqa: F401
    entry,
    oracle_sql,
    queries,
)

# Single-underscore helpers (e.g. ``_splitmix_cte_sql``, ``q_*`` siblings'
# shared fixtures) are part of the historical surface too — star-import
# skips them, so hoist everything the package defines.
import webextract.queries as _queries_pkg

for _name in dir(_queries_pkg):
    if not _name.startswith("__"):
        globals()[_name] = getattr(_queries_pkg, _name)
del _name, _queries_pkg
