"""Per-application memo for immutable Column expression fragments.

Building a PySpark ``Column`` is not free: every ``F.col`` / ``F.lit`` /
operator / ``.over(window)`` is a sequential py4j round-trip, and the
crawl wave loop rebuilds the same politeness/lineage/histogram
expression trees EVERY wave. A job-timeline probe (PLANS.md, r5) showed
this plan-construction time as a multi-second zero-jobs-running gap
between waves — pure driver latency that a 1000-executor cluster pays
exactly like local mode does. Fragments that depend only on column
NAMES and literals (not on a specific DataFrame) are immutable
expression trees, safe to reuse across queries within one Spark
application; this memo keys them by ``applicationId`` so a recycled JVM
(tests replace the JVM mid-process) can never serve stale py4j refs.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

_MEMO: dict[tuple, Any] = {}
_MAX_ENTRIES = 64
# The memo is read/evicted/written from several driver threads (the
# hist/metrics side-job threads build memoized Columns concurrently with
# the main wave loop's pick — ADVICE r5). The GIL made races benign but
# the size-cap clear() could evict the LIVE application's hot entries
# mid-wave; the lock is nanoseconds against the py4j cost being saved,
# and eviction now drops only entries from OTHER applications first.
_LOCK = threading.Lock()


def column_memo(spark, key: tuple, build: Callable[[], Any]) -> Any:
    """Return ``build()``, memoized under ``(applicationId,) + key``.

    ``build`` must return only immutable plan fragments (Column objects
    or tuples of them) that reference columns by NAME — never anything
    bound to a specific DataFrame. When the memo outgrows
    ``_MAX_ENTRIES``, entries from stopped/other applications (dead
    py4j weight) are evicted first; the live application's entries are
    cleared only if the cap is still exceeded."""
    app = spark.sparkContext.applicationId
    k = (app,) + key
    with _LOCK:
        hit = _MEMO.get(k)
    if hit is not None:
        return hit
    hit = build()  # outside the lock: py4j round-trips dominate
    with _LOCK:
        if len(_MEMO) > _MAX_ENTRIES:
            stale = [mk for mk in _MEMO if mk[0] != app]
            for mk in stale:
                del _MEMO[mk]
            if len(_MEMO) > _MAX_ENTRIES:
                _MEMO.clear()
        return _MEMO.setdefault(k, hit)
