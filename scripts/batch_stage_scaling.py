"""Per-stage scaling attribution for the batch pipeline: which stage
(match / cooldown / steps-join / count) scales sub-linearly from
local[4] to local[16]?

Invoked per parallelism (one JVM per master):
    python scripts/batch_stage_scaling.py <cpus> <input_dir>
Prints one JSON line with median-of-3 warm timings per stage, plus a
pure-JVM (match_turns_sql) variant of the match stage.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logeventprocessor_spark.operators.cooldown import apply_cooldown  # noqa: E402
from logeventprocessor_spark.operators.match import (  # noqa: E402
    match_turns,
    match_turns_sql,
)
from logeventprocessor_spark.pipeline import match_actions  # noqa: E402
from logeventprocessor_spark.rules import canonical_rules  # noqa: E402
from logeventprocessor_spark.session import get_spark  # noqa: E402


def med3(fn):
    xs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        xs.append(time.time() - t0)
    return round(statistics.median(xs), 3)


def main():
    cpus = int(sys.argv[1])
    input_dir = sys.argv[2]
    spark = get_spark(
        f"stage-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    rules = canonical_rules()
    turns = spark.read.parquet(input_dir)
    turns.count()
    match_actions(turns, rules).count()  # warm everything
    match_turns_sql(turns, rules).count()

    out = {
        "cpus": cpus,
        "scan": med3(lambda: turns.count()),
        "match": med3(lambda: match_turns(turns, rules).count()),
        "match_sql_jvm": med3(lambda: match_turns_sql(turns, rules).count()),
        "match_cooldown": med3(
            lambda: apply_cooldown(match_turns(turns, rules), rules).count()
        ),
        "full": med3(lambda: match_actions(turns, rules).count()),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
