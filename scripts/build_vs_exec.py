"""Split per-query wall time into (build+plan, execute) -- guide §1:
know WHERE the time goes before changing anything. Build = python query
construction + .queryExecution.executedPlan force (driver-side analysis/
optimization/physical planning); exec = noop-sink write of the
already-built frame. Run AFTER bench.py finishes (never concurrently).

Usage: python scripts/build_vs_exec.py <query> [...] [--runs N]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logeventprocessor_spark import queries as Q  # noqa: E402
from logeventprocessor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("queries", nargs="+")
    p.add_argument("--runs", type=int, default=5)
    args = p.parse_args()
    spark = get_spark(
        "build_vs_exec", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    qs = Q.build_queries()
    for name in args.queries:
        builds, plans, execs = [], [], []
        for _ in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            # force analysis + optimization + physical planning
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            builds.append(round(t1 - t0, 3))
            plans.append(round(t2 - t1, 3))
            execs.append(round(t3 - t2, 3))
        print(json.dumps({
            "query": name,
            "build_median": statistics.median(builds),
            "plan_median": statistics.median(plans),
            "exec_median": statistics.median(execs),
            "builds": builds, "plans": plans, "execs": execs,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
