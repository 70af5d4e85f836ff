#!/usr/bin/env python
"""Inverse sweep for catalog.EAGER_CONSTRUCTION (run per round).

The type gate (tests/test_oracle_types.py) skips flagged entries and
self-enforces the forward direction: an UNflagged entry that runs jobs
at construction fails loudly there. This script enforces the inverse —
a FLAGGED entry whose construction has become lazy is a stale flag that
silently keeps skipping the cheap authoring-time type gate forever.

Replicates the type-gate context (warm footers, one session, alphabetic
order over the flagged names), constructs each flagged entry under a
job group, and reports any that ran ZERO jobs. Exit 1 if stale flags
are found. NOTE: some flags are eager only on FIRST construction
(marker-cached fixture builds) — a stale report here means "lazy on a
warm session in alphabetic order", which is exactly the context the
type gate runs in, so the flag buys nothing and should be removed.

    python scripts/check_eager_flags.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_query_optimizer_spark.operators import catalog
from dbms_query_optimizer_spark.cache import release_tracked
from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    spark = get_spark(app_name="check_eager_flags", master="local[8]",
                      shuffle_partitions=8)
    sc = spark.sparkContext
    for df in load_tables(spark, SF_DIR).values():
        df.schema  # warm footers, same as the type gate's autouse fixture

    stale, raised = [], []
    flagged = sorted(catalog.EAGER_CONSTRUCTION)
    missing = [n for n in flagged if n not in catalog.CATALOG]
    for name in flagged:
        if name in missing:
            continue
        fn = catalog.CATALOG[name][0]
        group = f"eager-sweep-{name}"
        sc.setJobGroup(group, group)
        try:
            fn(spark, SF_DIR)
        except Exception as exc:
            # a raise means the flag was NOT validated this run — count
            # it, don't silently shrink the sweep's coverage
            print(f"{name}: construction RAISED ({str(exc)[:90]}) — UNVERIFIED")
            raised.append(name)
            continue
        finally:
            sc.setJobGroup("", "")
            release_tracked()
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        tag = "eager" if jobs else "STALE FLAG (0 jobs at construction)"
        print(f"{name}: {len(jobs)} job(s) — {tag}")
        if not jobs:
            stale.append(name)

    if missing:
        print(f"\nflags for unregistered names: {missing}")
    if raised:
        print(f"\n{len(raised)} flag(s) unverifiable (construction raised) — "
              f"fix the construction or the fixture:\n  {raised}")
    if stale:
        print(f"\n{len(stale)} stale flag(s) — remove from EAGER_CONSTRUCTION "
              f"to restore their authoring-time type gate:\n  {stale}")
    return 1 if (stale or missing or raised) else 0


if __name__ == "__main__":
    sys.exit(main())
