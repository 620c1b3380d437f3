"""Decompose the streaming pipeline's wall time into its component
floors (round-3 verdict task #4: 8.1 s streaming vs 2.3 s batch on the
same input -- find out where the extra 5.8 s lives).

Each shape runs as its own availableNow query over the SAME warmed
input with a fresh checkpoint, so differences isolate one component:

  scan        source -> foreachBatch(count)         trigger+commit+scan
  match       + mapInArrow regex match               + Python boundary
  match_sink  + ParquetUpsertSink (no cooldown/steps) + sink write
  cool        match(hot)+applyInPandasWithState      keyed-state op
  cool_conv   same but state keyed by conv_id ONLY   group-count effect
  full        build_match_stream + sink              the r3 bench shape
  full_snapshot  one match pass + snapshot-state cooldown (r4 default)

Measured medians (1.05M turns, local[32], interleaved x3, 2026-08-17):
scan 0.70 / match 1.03 / match_sink 1.67 / cool 5.76 / cool_conv 5.69 /
full 6.7-7.2 / full_snapshot 2.96. Controls: the state op costs
3.7 s at 32 shuffle partitions (1.7 s at 8) with ZERO input rows --
a fixed per-trigger floor (per-partition Python state workers +
state-store load/commit + timer scans), NOT per-group cost; keying by
conv_id instead of (conv_id, rule_id) does not move it. That floor is
what the snapshot backend removes.

Run: python scripts/stream_floor.py [n_runs] [shape,shape,...]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from logeventprocessor_spark.generator import (  # noqa: E402
    make_transcripts_fast,
    write_transcripts_parquet,
)
from logeventprocessor_spark.operators.match import match_turns  # noqa: E402
from logeventprocessor_spark.rules import canonical_rules  # noqa: E402
from logeventprocessor_spark.session import get_spark  # noqa: E402
from logeventprocessor_spark.streaming.pipeline import (  # noqa: E402
    build_match_stream,
    read_transcripts_stream,
    stream_cooldown,
)
from logeventprocessor_spark.streaming.sink import ParquetUpsertSink  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("FLOOR_N_CONVS", "20000"))
WM = "10 minutes"


def _run_query(writer_builder, tmp):
    sdir = tempfile.mkdtemp(prefix="floor_", dir=tmp)
    t0 = time.time()
    q = writer_builder(sdir)
    q.awaitTermination(3600)
    dt = time.time() - t0
    shutil.rmtree(sdir, ignore_errors=True)
    return dt


def shape_scan(spark, turns_dir, rules, tmp):
    stream = read_transcripts_stream(spark, turns_dir, None)

    def build(sdir):
        return (
            stream.writeStream.foreachBatch(lambda df, bid: df.count())
            .option("checkpointLocation", f"{sdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )

    return _run_query(build, tmp)


def shape_match(spark, turns_dir, rules, tmp):
    stream = read_transcripts_stream(spark, turns_dir, None)
    m = match_turns(stream, [r for r in rules if r.enabled])

    def build(sdir):
        return (
            m.writeStream.foreachBatch(lambda df, bid: df.count())
            .option("checkpointLocation", f"{sdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )

    return _run_query(build, tmp)


def shape_match_sink(spark, turns_dir, rules, tmp):
    from logeventprocessor_spark.operators.steps import expand_steps

    stream = read_transcripts_stream(spark, turns_dir, None)
    acts = expand_steps(match_turns(stream, [r for r in rules if r.enabled]), rules)

    def build(sdir):
        sink = ParquetUpsertSink(f"{sdir}/out")
        return (
            acts.writeStream.foreachBatch(sink.foreach_batch())
            .option("checkpointLocation", f"{sdir}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    return _run_query(build, tmp)


def shape_cool(spark, turns_dir, rules, tmp):
    hot = [r for r in rules if r.enabled and r.cooldown_ms > 0]
    stream = read_transcripts_stream(spark, turns_dir, None)
    m = match_turns(stream, hot).withWatermark("ts", WM)
    gated = stream_cooldown(m, hot)

    def build(sdir):
        return (
            gated.writeStream.foreachBatch(lambda df, bid: df.count())
            .option("checkpointLocation", f"{sdir}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    return _run_query(build, tmp)


def shape_cool_conv(spark, turns_dir, rules, tmp):
    """State keyed by conv_id only: all hot rules of a conversation in
    one group -> fewer Python group dispatches, same semantics."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    from logeventprocessor_spark.operators.cooldown import suppress_group
    from logeventprocessor_spark.schema import MATCHES_SCHEMA

    hot = [r for r in rules if r.enabled and r.cooldown_ms > 0]
    cooldowns = {r.rule_id: r.cooldown_ms for r in hot}
    state_schema = T.StructType(
        [
            T.StructField("rule_ids", T.ArrayType(T.StringType()), True),
            T.StructField("last_ns", T.ArrayType(T.LongType()), True),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        pdfs = [p for p in pdf_iter if not p.empty]
        if not pdfs:
            return
        g = pd.concat(pdfs, ignore_index=True)
        st = state.getOption
        last_map = dict(zip(st[0], st[1])) if st is not None else {}
        max_cd_end = 0
        for rule_id, rg in g.groupby("rule_id", sort=False):
            cd = cooldowns[rule_id]
            rg = rg.sort_values(["ts", "turn_idx"], kind="mergesort")
            kept, new_last = suppress_group(
                rg, cd, last_fire_ns=last_map.get(rule_id)
            )
            if new_last is not None:
                last_map[rule_id] = int(new_last)
                max_cd_end = max(max_cd_end, new_last // 1_000_000 + cd)
            if len(kept):
                yield kept
        if last_map:
            state.update((list(last_map), [last_map[k] for k in last_map]))
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_cd_end + 1000, wm + 1000))

    stream = read_transcripts_stream(spark, turns_dir, None)
    m = match_turns(stream, hot).withWatermark("ts", WM)
    gated = m.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=MATCHES_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

    def build(sdir):
        return (
            gated.writeStream.foreachBatch(lambda df, bid: df.count())
            .option("checkpointLocation", f"{sdir}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    return _run_query(build, tmp)


def shape_full(spark, turns_dir, rules, tmp):
    stream = read_transcripts_stream(spark, turns_dir, None)
    actions = build_match_stream(stream, rules, WM)

    def build(sdir):
        sink = ParquetUpsertSink(f"{sdir}/out")
        return (
            actions.writeStream.foreachBatch(sink.foreach_batch())
            .option("checkpointLocation", f"{sdir}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    return _run_query(build, tmp)


def shape_full_snapshot(spark, turns_dir, rules, tmp):
    """The round-4 default: one match pass + snapshot-state cooldown in
    foreachBatch (start_pipeline cooldown_backend='snapshot')."""
    from logeventprocessor_spark.streaming.pipeline import start_pipeline

    def run():
        sdir = tempfile.mkdtemp(prefix="floor_", dir=tmp)
        t0 = time.time()
        q, _ = start_pipeline(
            spark, turns_dir, rules,
            out_dir=f"{sdir}/out", checkpoint_dir=f"{sdir}/ckpt",
            watermark=WM, max_files_per_trigger=None,
        )
        q.awaitTermination(3600)
        dt = time.time() - t0
        shutil.rmtree(sdir, ignore_errors=True)
        return dt

    return run()


SHAPES = {
    "scan": shape_scan,
    "match": shape_match,
    "match_sink": shape_match_sink,
    "cool": shape_cool,
    "cool_conv": shape_cool_conv,
    "full": shape_full,
    "full_snapshot": shape_full_snapshot,
}


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else list(SHAPES)
    spark = get_spark(
        "stream-floor", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    pdf = make_transcripts_fast(n_convs=N_CONVS, mean_turns=48, seed=42)
    n_turns = len(pdf)
    print(f"n_turns={n_turns} cpus={CPUS}", flush=True)
    tmp = tempfile.mkdtemp(prefix="floor_input_")
    try:
        write_transcripts_parquet(pdf, f"{tmp}/turns", n_files=max(CPUS * 2, 16))
        del pdf
        rules = canonical_rules()
        for name in only:  # warmup
            SHAPES[name](spark, f"{tmp}/turns", rules, tmp)
        results = {name: [] for name in only}
        for i in range(n_runs):
            for name in only:  # interleave against host drift
                dt = SHAPES[name](spark, f"{tmp}/turns", rules, tmp)
                results[name].append(dt)
                print(f"run{i} {name}: {dt:.2f}s", flush=True)
        print("--- medians ---")
        for name in only:
            med = statistics.median(results[name])
            print(f"{name}: {med:.2f}s  all={['%.2f' % x for x in sorted(results[name])]}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
