"""One scaling-bench run at a fixed parallelism. Invoked as a
subprocess (a JVM cannot change its master once started):

    python scripts/scaling_worker.py <cpus> <input_dir> [mode]

Prints one JSON line: {"cpus", "batch_s", "stream_s", "n_turns",
"n_actions"}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logeventprocessor_spark.pipeline import match_actions  # noqa: E402
from logeventprocessor_spark.rules import canonical_rules  # noqa: E402
from logeventprocessor_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(sys.argv[1])
    input_dir = sys.argv[2]
    # input-split sizing: the ~8 MB bench files pack into ~13 partitions
    # under the 128 MB default, capping scan+match parallelism below
    # local[16]/local[32]. A real 100 TB table yields far more splits
    # than executors at ANY cluster size, so the faithful proxy keeps
    # splits >> cores at both levels: one file per partition.
    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    rules = canonical_rules()
    turns = spark.read.parquet(input_dir)
    n_turns = turns.count()  # warm file listing + page cache
    n_splits = turns.rdd.getNumPartitions()

    # measure WARM steady-state: run once to amortize Python-worker
    # launch + JIT (a long-running cluster job is always warm), then
    # take the median of 3 timed runs
    n_actions = match_actions(turns, rules, with_cooldown=True).count()
    times = []
    for _ in range(5):
        t0 = time.time()
        match_actions(turns, rules, with_cooldown=True).count()
        times.append(time.time() - t0)
    batch_s = sorted(times)[2]  # median of 5

    from logeventprocessor_spark.streaming.pipeline import start_pipeline

    def stream_steady(tag):
        """Steady-state streaming throughput: run ~8 micro-batches and
        measure rows/total-busy-time from the query's own progress
        (excludes JVM/query setup and the final no-data batch)."""
        tmp = tempfile.mkdtemp(prefix=f"scale{cpus}_{tag}_")
        try:
            # 32 files/trigger: with one split per file this keeps the
            # per-micro-batch task count >= cores at EVERY level (16
            # files would cap the match stage below local[32])
            q, _ = start_pipeline(
                spark, input_dir, rules,
                out_dir=f"{tmp}/out", checkpoint_dir=f"{tmp}/ckpt",
                watermark="10 minutes", max_files_per_trigger=32,
            )
            q.awaitTermination(3600)
            rows = dur = 0
            for p in q.recentProgress:
                if p["numInputRows"] > 0:
                    rows += p["numInputRows"]
                    dur += p["batchDuration"] / 1000.0
            return rows / dur if dur else 0.0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    stream_steady("warm")
    stream_tps = stream_steady("timed")
    stream_s = n_turns / stream_tps if stream_tps else 0.0

    # pure-JVM control leg (round-3 verdict task #5c): the same match
    # as whole-stage-codegen RLIKE/regexp_extract with NO Python
    # boundary -- its scaling curve quantifies how much of the
    # pipeline's efficiency loss is the Arrow/Python crossing vs the
    # host itself
    from logeventprocessor_spark.operators.match import match_turns_sql

    match_turns_sql(turns, rules).count()  # warm
    times = []
    for _ in range(2):  # best-of across mirrored legs absorbs noise
        t0 = time.time()
        match_turns_sql(turns, rules).count()
        times.append(time.time() - t0)
    jvm_s = min(times)

    print(json.dumps({
        "cpus": cpus,
        "batch_s": round(batch_s, 3),
        "stream_s": round(stream_s, 3),
        "jvm_match_s": round(jvm_s, 3),
        "n_turns": n_turns,
        "n_actions": n_actions,
        "n_input_splits": n_splits,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
