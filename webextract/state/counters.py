"""Cluster-wide named counters for data-loss visibility.

"No silent caps" at fleet scale: an operator that drops work (an oversized
LSH bucket, a quarantined record class) must surface HOW MUCH it dropped in
the run report, not only in worker logs a 100 TB run will never grep. A
single named zero-CPU counter actor collects increments from every worker;
`snapshot()` folds them into the run's JSON report.

This is the one place raw `@ray.remote` state is warranted (shared mutable
counter — the Dataset API can't express cross-operator side channels); the
actor is get-or-create by name so library code needs no plumbing.
"""

from __future__ import annotations

from typing import Dict, Optional

_COUNTER_NAME = "webextract_counters"


def _ray():
    import ray

    return ray


def get_counter(name: str = _COUNTER_NAME):
    """Get-or-create the named counter actor (race-safe via
    get_if_exists). Returns None when Ray is not initialised (pure-local
    library use keeps working without counters)."""
    ray = _ray()
    if not ray.is_initialized():
        return None

    @ray.remote(num_cpus=0)
    class CounterActor:
        def __init__(self):
            self.counts: Dict[str, int] = {}

        def incr(self, key: str, n: int = 1) -> None:
            self.counts[key] = self.counts.get(key, 0) + int(n)

        def get(self) -> Dict[str, int]:
            return dict(self.counts)

        def reset(self) -> None:
            self.counts.clear()

    # detached: a counter created inside a short-lived map task must outlive
    # that task's actor handle so the driver can read it afterwards
    return CounterActor.options(
        name=name, get_if_exists=True, lifetime="detached"
    ).remote()


def incr(key: str, n: int = 1, name: str = _COUNTER_NAME) -> None:
    """Increment from any worker/driver context. BLOCKS on the ack so the
    count is visible once the calling task finishes (events using counters
    are rare — skip paths — so the round-trip is not a hot-path cost)."""
    actor = get_counter(name)
    if actor is not None:
        _ray().get(actor.incr.remote(key, n))


def snapshot(name: str = _COUNTER_NAME,
             reset: bool = False) -> Optional[Dict[str, int]]:
    """Read (and optionally clear) the counters; None when unavailable."""
    ray = _ray()
    if not ray.is_initialized():
        return None
    try:
        actor = ray.get_actor(name)
    except ValueError:
        return None
    counts = ray.get(actor.get.remote())
    if reset:
        ray.get(actor.reset.remote())
    return counts
