"""Isolate WHY the mapInPandas match stage scales sub-linearly 4->16:
Arrow boundary vs regex CPU vs input splits vs JVM baseline.

    python scripts/match_scaling_probe.py <cpus> <input_dir>
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from logeventprocessor_spark.operators.match import match_turns  # noqa: E402
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
        f"probe-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    rules = canonical_rules()
    turns = spark.read.parquet(input_dir)
    turns.count()

    def noop_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    noop = lambda: turns.select("conv_id", "turn_idx", "text", "ts").mapInPandas(  # noqa: E731
        noop_fn, schema="n long"
    ).count()

    def lower_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            s = pdf["text"].str.lower()
            yield pd.DataFrame({"n": [int(s.str.len().sum())]})

    lower = lambda: turns.select("text").mapInPandas(  # noqa: E731
        lower_fn, schema="n long"
    ).count()

    jvm_proj = lambda: turns.select(  # noqa: E731
        F.sum(F.length(F.lower("text")))
    ).collect()

    # warm
    noop(); lower(); jvm_proj(); match_turns(turns, rules).count()

    out = {
        "cpus": cpus,
        "jvm_lower_len_sum": med3(jvm_proj),
        "arrow_noop_4col": med3(noop),
        "arrow_lower_1col": med3(lower),
        "match_full": med3(lambda: match_turns(turns, rules).count()),
        "n_splits": turns.rdd.getNumPartitions(),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
