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

from typing import Any, Callable

_MEMO: dict[tuple, Any] = {}
_MAX_ENTRIES = 64


def column_memo(spark, key: tuple, build: Callable[[], Any]) -> Any:
    """Return ``build()``, memoized under ``(applicationId,) + key``.

    ``build`` must return only immutable plan fragments (Column objects
    or tuples of them) that reference columns by NAME — never anything
    bound to a specific DataFrame. The whole memo is dropped when it
    outgrows ``_MAX_ENTRIES`` (entries from stopped applications are
    dead weight; wholesale clearing is simpler than per-app eviction
    and the rebuild cost is one wave's py4j round-trips)."""
    k = (spark.sparkContext.applicationId,) + key
    hit = _MEMO.get(k)
    if hit is None:
        if len(_MEMO) > _MAX_ENTRIES:
            _MEMO.clear()
        hit = build()
        _MEMO[k] = hit
    return hit
