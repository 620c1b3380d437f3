"""A/B profile of the streaming pipeline shape at bench scale
(round-2 verdict task #2: explain the r2 streaming bench regression).

Shapes:
  A: current build_match_stream -- hot/cold rule split, two branches
     (source scan + Arrow transfer of ALL turns runs once per branch);
  B: single branch -- one match pass over all rules, ALL matches keyed
     through the state operator (zero-cooldown rules pass through).

Run: python scripts/stream_ab.py [n_runs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from logeventprocessor_spark.generator import (  # noqa: E402
    make_transcripts_fast,
    write_transcripts_parquet,
)
from logeventprocessor_spark.rules import canonical_rules  # noqa: E402
from logeventprocessor_spark.session import get_spark  # noqa: E402
from logeventprocessor_spark.streaming.pipeline import (  # noqa: E402
    build_match_stream,
    read_transcripts_stream,
    stream_cooldown,
)
from logeventprocessor_spark.operators.match import match_turns  # noqa: E402
from logeventprocessor_spark.operators.steps import expand_steps  # noqa: E402
from logeventprocessor_spark.streaming.sink import ParquetUpsertSink  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("AB_N_CONVS", "20000"))


def build_single_branch(stream, rules, watermark="10 minutes"):
    """Shape B: one scan, one match pass, all matches through state."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from logeventprocessor_spark.operators.cooldown import suppress_group
    from logeventprocessor_spark.schema import MATCHES_SCHEMA
    from logeventprocessor_spark.streaming.pipeline import (
        COOLDOWN_STATE_SCHEMA,
    )

    cooldowns = {r.rule_id: r.cooldown_ms for r in rules if r.cooldown_ms > 0}
    m = match_turns(stream, rules).withWatermark("ts", watermark)

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        conv_id, rule_id = key
        cd = cooldowns.get(rule_id, 0)
        pdfs = [p for p in pdf_iter if not p.empty]
        if not pdfs:
            return
        g = pd.concat(pdfs, ignore_index=True)
        if cd <= 0:
            yield g
            return
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        st = state.getOption
        last_ns = st[0] if st is not None else None
        kept, new_last = suppress_group(g, cd, last_fire_ns=last_ns)
        if new_last is not None:
            state.update((int(new_last),))
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(new_last // 1_000_000 + cd + 1000, wm + 1000)
            )
        if len(kept):
            yield kept

    gated = m.groupBy("conv_id", "rule_id").applyInPandasWithState(
        fn,
        outputStructType=MATCHES_SCHEMA,
        stateStructType=COOLDOWN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return expand_steps(gated, rules)


def run_shape(spark, shape, turns_dir, rules):
    tmp = tempfile.mkdtemp(prefix=f"ab_{shape}_")
    try:
        stream = read_transcripts_stream(spark, turns_dir, None)
        if shape == "A":
            actions = build_match_stream(stream, rules, "10 minutes")
        else:
            actions = build_single_branch(stream, rules, "10 minutes")
        sink = ParquetUpsertSink(f"{tmp}/out")
        t0 = time.time()
        q = (
            actions.writeStream.foreachBatch(sink.foreach_batch())
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(3600)
        dt = time.time() - t0
        n = spark.read.parquet(f"{tmp}/out/batches/batch_id=*").count()
        return dt, n
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        "stream-ab", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    pdf = make_transcripts_fast(n_convs=N_CONVS, mean_turns=48, seed=42)
    n_turns = len(pdf)
    tmp = tempfile.mkdtemp(prefix="ab_input_")
    try:
        write_transcripts_parquet(pdf, f"{tmp}/turns", n_files=max(CPUS * 2, 16))
        del pdf
        rules = canonical_rules()
        # warmup both shapes once (python workers, JIT)
        for s in ("A", "B"):
            run_shape(spark, s, f"{tmp}/turns", rules)
        results = {"A": [], "B": []}
        for i in range(n_runs):
            for s in ("A", "B"):  # alternate to decorrelate host drift
                dt, n = run_shape(spark, s, f"{tmp}/turns", rules)
                results[s].append(dt)
                print(f"run{i} shape {s}: {dt:.2f}s rows={n} "
                      f"({n_turns/dt:,.0f} turns/s)", flush=True)
        for s in ("A", "B"):
            xs = sorted(results[s])
            print(f"shape {s}: median {xs[len(xs)//2]:.2f}s  all={['%.2f' % x for x in xs]}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
