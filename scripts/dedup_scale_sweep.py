#!/usr/bin/env python
"""Dedup-family wall-time sweep across document decades (r10 verdict
task 4: the retrieval stack has sf0.001→sf1 flatness evidence; the
dedup family's Σ|bucket|² boundedness claims stopped at sf0.1).

Times the three banded/bucketed dedup representatives the verdict
names — winnowing (positional fingerprints, stop-cap blocked pair
join), set-similarity prefix filtering, and MinHash+LSH — at each SF
and prints the per-decade wall ratios next to the data ratios. The
claim under test: candidate generation is bucket-bounded, so wall time
grows ~linearly with corpus size (never quadratically); at these local
sizes, where round-scheduling overhead dominates, the decade ratio
should sit well under the 10× data ratio. Result row counts are
printed as a sanity signal that the bigger fixture actually contains
duplicate structure (gen_scale_fixture.py derives ~70% of new docs as
near-dups).

    python scripts/gen_scale_fixture.py   # once, builds .scale_fixtures/sf1
    python scripts/dedup_scale_sweep.py [sf0.01 sf0.1 .scale_fixtures/sf1]

Run on a quiet box (same measurement rules as bench.py: min-of-N warm
runs, noop sink, no killable timeout). Exits nonzero only on a query
error — the ratios are evidence for SCALING.md, not a hard gate,
because the dominant cost at local scale is scheduling, not data.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_query_optimizer_spark.cache import release_tracked
from dbms_query_optimizer_spark.operators import catalog
from dbms_query_optimizer_spark.session import get_spark

QUERIES = ["dedup_winnowing", "dedup_set_similarity_prefix", "dedup_minhash_lsh"]
RUNS = 3  # min-of-3, the bench.py standard


def main() -> int:
    sfs = sys.argv[1:] or ["sf0.01", "sf0.1", ".scale_fixtures/sf1"]
    spark = get_spark(
        app_name="dedup_scale_sweep",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    results: list[tuple[str, int, dict[str, float], dict[str, int]]] = []
    for sf in sfs:
        sf_dir = (
            sf
            if os.sep in sf
            else (f"/root/testdata/{sf}" if sf.startswith("sf") else sf)
        )
        if not os.path.isabs(sf_dir):
            sf_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))), sf_dir
            )
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        timings: dict[str, float] = {}
        rows: dict[str, int] = {}
        for name in QUERIES:
            fn = qs[name]
            best = float("inf")
            for _ in range(RUNS):
                t0 = time.monotonic()
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.monotonic() - t0)
            rows[name] = fn(spark, sf_dir).count()
            release_tracked()
            timings[name] = round(best, 3)
            print(f"{sf}: n_docs={n_docs} {name} {best:.3f}s rows={rows[name]}")
        results.append((sf, n_docs, timings, rows))

    print("\nper-decade ratios (wall vs data):")
    for (sf0, n0, t0, _), (sf1, n1, t1, _) in zip(results, results[1:]):
        for name in QUERIES:
            print(
                f"  {name}: {sf0}->{sf1} data x{n1 / n0:.0f} "
                f"wall {t0[name]:.3f}->{t1[name]:.3f}s "
                f"(x{t1[name] / max(t0[name], 1e-9):.2f})"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
