#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <scale factor>}

Each query executes fully via the no-op sink (computation without driver
result transfer), so timings measure engine work, not collect() serde.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbms_query_optimizer_spark.operators import catalog  # noqa: E402
from dbms_query_optimizer_spark.session import get_spark  # noqa: E402

# The headline set: one per operator family — relational joins/aggs, the
# cost-based pipeline, windows/top-k, every dedup strategy, similarity,
# text analysis, event-time processing.
HEADLINE = [
    "flagship_join_agg",
    "agg_grouped",
    "join_multiway",
    "cbo_ordered_join",
    "topk_per_group",
    "window_running",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "knn_brute_force",
    "knn_lsh_bucketed",
    "text_quality",
    "text_lang_quality_summary",
    "events_tumbling",
    "events_sessionized",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    qs = catalog.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
