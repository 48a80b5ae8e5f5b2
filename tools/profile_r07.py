"""Round-7 profiling harness (bench.py methodology, subset + reps).

Times qs[name](spark, sf_dir).count() with the SAME session confs as
bench.py, but over an arbitrary subset and rep count, printing one JSON
line per query: {"q": name, "secs": [..]}. Used for interleaved A/B and
before/after readings without touching the frozen bench.py.

Usage: python tools/profile_r07.py [--reps N] [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ngxspark import queries as Q
    from ngxspark.session import get_spark

    spark = get_spark(
        app="ngxspark-profile-r07",
        cores=cpus,
        master=os.environ.get("SPARK_GRAFT_MASTER"),
        extra={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
            "spark.locality.wait": "0s",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = Q.queries()
    names = args or list(qs)
    for name in names:
        if name not in qs:
            print(json.dumps({"q": name, "err": "unknown"}))
            continue
        secs, builds, plans = [], [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.count()
            t3 = time.perf_counter()
            secs.append(round(t3 - t0, 3))
            builds.append(round(t1 - t0, 3))
            plans.append(round(t2 - t1, 3))
        print(
            json.dumps(
                {
                    "q": name,
                    "secs": secs,
                    "min": min(secs),
                    "build": builds,   # query construction incl. eager jobs
                    "plan": plans,     # driver-side analysis+physical planning
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
