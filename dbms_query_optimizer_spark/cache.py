"""Session-scoped registry for persisted intermediate frames.

Several catalog queries ``persist()`` an intermediate frame that is read
two or more times downstream (pooled moments + per-arm readout, candidate
passes, join-back fan-in). ``persist`` keeps lineage intact — unlike
``localCheckpoint`` it stays fault-tolerant on a real cluster — but the
query functions return *lazy* DataFrames, so there is no point inside the
function at which the cache has been consumed and can be dropped.

Over a full-catalog run (330 queries in one session: the grading driver,
``tests/test_queries_oracle.py``, ``bench.py``) those cached frames would
otherwise accumulate in executor storage and lean on LRU eviction, causing
spill/recompute churn mid-run. This registry closes the loop: query
functions register each persisted frame via :func:`track_persist`, and the
harnesses call :func:`release_tracked` after the action that consumes a
query's result. One query's caches never outlive its own evaluation.

Interactive/ad-hoc callers that never call :func:`release_tracked` are no
worse off than before: the registry holds plain references and Spark's LRU
still applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` (default MEMORY_AND_DISK) and register it for
    release by the harness once the consuming action has run.

    ONE-QUERY-IN-FLIGHT contract: the registry is a single global list,
    so harnesses must fully evaluate (and then ``release_tracked()``)
    one query before CONSTRUCTING the next. Interleaving — build B,
    consume A, release — would unpersist B's tracked frames early
    (recompute cost downstream, never wrong results). Wrap the per-query
    body in try/finally release_tracked() so a failing entry cannot
    leak its frames into the rest of a sweep."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame. Call after the action that consumed
    the query result (collect/toPandas/write). Returns the number
    released. Safe to call repeatedly; never raises on a dead session."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    return n
