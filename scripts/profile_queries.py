#!/usr/bin/env python
"""Per-query profiler for optimization rounds: times each named query
(min-of-3, noop sink — bench methodology) and writes its
``explain("formatted")`` plan to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python scripts/profile_queries.py [--plans-tag r11] [--suffix before]
        [--sf /root/testdata/sf0.1] [--runs 3] [--no-plans] name [name ...]

Prints one JSON line {name: sec, ...} at the end. Unlike bench.py this
is a scoped instrument: it reuses one warm session and times only the
requested names, so A/B comparisons of a single query avoid the full
sweep's 15-minute wall.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbms_query_optimizer_spark.cache import release_tracked  # noqa: E402
from dbms_query_optimizer_spark.operators import catalog  # noqa: E402
from dbms_query_optimizer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-tag", default=None, help="plans/<tag>/ dir")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="reprofile", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    from dbms_query_optimizer_spark.engine import load_tables

    for df in load_tables(spark, args.sf).values():
        df.count()
    spark.range(1024).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    qs = catalog.queries()
    plans_dir = None
    if args.plans_tag:
        plans_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            args.plans_tag,
        )
        os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best = float("inf")
        for _ in range(args.runs):  # --runs 0 = plans only, no timing
            t0 = time.monotonic()
            df = fn(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.monotonic() - t0)
        if plans_dir is not None:
            pdf = fn(spark, args.sf)
            plan = pdf._sc._jvm.PythonSQLUtils.explainString(
                pdf._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        release_tracked()
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
