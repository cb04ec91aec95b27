"""Per-module tracked-cache registry.

Several operators cache an intermediate relation that their RETURNED
lazy plan still reads (a TF-IDF index, a per-doc bigram relation, a
MinHash signature table…), so the operator itself can never unpersist
it — releasing before the consumer materializes silently recomputes
the lineage instead of breaking.  One-shot jobs don't care (the
SparkContext dies with the process) and the bench harness clears the
SQL cache between queries, but a LONG-LIVED session — a notebook, the
pytest oracle sweep, or a ``foreachBatch`` streaming runner calling a
scoring operator once per micro-batch — accumulates one orphaned
cached relation per call until the session dies.

The contract (established by ``operators/textsim.release_caches``,
VERDICT r6 ADVICE #4, and generalized here): each module routes its
caches through its own :class:`CacheTracker` and exposes
``release_caches()``; owners call it AFTER the consuming DataFrames
are materialized.  :func:`release_all` drains every module's tracker
at once — the right call for harnesses that compose operators across
modules (e.g. ``curation.annotate`` caches in both the curation and
dedup trackers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: every CacheTracker ever constructed, in construction order — the
#: registry :func:`release_all` drains.  Module-lifetime objects only
#: (one per operator module), so this never grows unboundedly.
_TRACKERS: list["CacheTracker"] = []


class CacheTracker:
    """Tracks the cached DataFrames one module creates so callers can
    release them between passes instead of leaking one per call."""

    def __init__(self) -> None:
        self._live: list[DataFrame] = []
        _TRACKERS.append(self)

    def track(self, df: DataFrame) -> DataFrame:
        """``df.cache()`` + remember the handle for :meth:`release`."""
        df = df.cache()
        self._live.append(df)
        return df

    def release(self) -> int:
        """Unpersist every tracked relation (LIFO); returns the count.
        Call only after the consuming DataFrames are materialized —
        releasing earlier recomputes their lineage instead of failing."""
        n = 0
        while self._live:
            self._live.pop().unpersist()
            n += 1
        return n


def release_all() -> int:
    """Drain every module's tracker; returns the total released."""
    return sum(t.release() for t in _TRACKERS)
