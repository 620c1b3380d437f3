"""Round-5 streaming-scaling attack (round-4 verdict tasks #3 + #8).

Three questions, each answered by measurement, not argument:

1. TRIGGER SIZING: the snapshot backend's per-trigger fixed work
   (snapshot read/commit, two job launches, driver bookkeeping) does
   not shrink with cores, so at fixed maxFilesPerTrigger the 4->16
   ratio under-reports scaling. On a REAL 4x-bigger cluster a trigger
   carries 4x the rows (input rate x trigger interval), so the
   faithful comparison also scales the trigger: local[4]@mfpt=32 vs
   local[16]@mfpt=128 holds files-per-core constant at 8.  Both the
   fixed-trigger pair and the scaled-trigger pair are reported.

2. PHASE + IPC DECOMPOSITION: per-batch wall time split into
   gate-plan / sink+compute / snapshot-advance (sink.phases), plus the
   Arrow RecordBatch bytes and rows actually crossing the JVM<->Python
   match boundary (Spark accumulators inside mapInArrow) -- the
   IPC-bytes-per-config number the round-4 verdict asked for.

3. PROCESS ISOLATION (#8): the single-host bus-saturation argument
   predicts >=0.8 for DISTINCT executors. local-cluster[W,4,mem] runs
   each executor as a SEPARATE JVM child process with its own Python
   worker pool: local-cluster[1,4,*] vs local-cluster[4,4,*] is the
   1-executor vs 4-executor pair (per-executor size constant, count
   scaled -- exactly how a real cluster grows).

Every config is sampled twice in a mirrored schedule (host drifts
20-30% across a 30-min window; see BENCH/BASELINE.md) and combined
best-of. Output: BENCH/scaling_attack.json + a markdown summary on
stdout.

Run: python scripts/scaling_attack.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from logeventprocessor_spark.generator import (  # noqa: E402
    make_transcripts_fast,
    write_transcripts_parquet,
)


def run_leg(master: str, input_dir: str, mfpt: int, legs: str,
            ipc: bool = False, runs: int = 3) -> dict:
    args = [sys.executable, os.path.join(REPO, "scripts/scaling_worker.py"),
            master, input_dir, f"--mfpt={mfpt}", f"--legs={legs}",
            f"--runs={runs}"]
    if ipc:
        args.append("--ipc")
    env = dict(os.environ, SPARK_DRIVER_MEM="48g")
    out = subprocess.run(args, capture_output=True, text=True,
                         timeout=3600, cwd=REPO, env=env)
    if out.returncode != 0:
        raise RuntimeError(
            f"leg {master} mfpt={mfpt} failed:\n{out.stderr[-4000:]}"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    tmp = tempfile.mkdtemp(prefix="scalatk_")
    pdf = make_transcripts_fast(n_convs=n_convs, mean_turns=48, seed=42)
    n_turns = len(pdf)
    write_transcripts_parquet(pdf, f"{tmp}/turns", n_files=128)
    del pdf
    inp = f"{tmp}/turns"

    # (key, master, mfpt, legs, ipc)
    configs = [
        ("l4_m32", "local[4]", 32, "stream", True),
        ("l16_m32", "local[16]", 32, "stream", True),
        ("l16_m64", "local[16]", 64, "stream", False),
        ("l16_m128", "local[16]", 128, "stream", False),
        ("lc1x4", "local-cluster[1,4,10240]", 32, "batch,stream", False),
        ("lc4x4", "local-cluster[4,4,10240]", 32, "batch,stream", False),
    ]
    by_key = {c[0]: c for c in configs}
    schedule = [c[0] for c in configs] + [c[0] for c in reversed(configs)]
    samples: dict[str, list[dict]] = {}
    for key in schedule:
        _, master, mfpt, legs, ipc = by_key[key]
        t0 = time.time()
        r = run_leg(master, inp, mfpt, legs, ipc=ipc, runs=2)
        r["leg_wall_s"] = round(time.time() - t0, 1)
        samples.setdefault(key, []).append(r)
        print(f"# {key}: stream_s={r['stream_s']} batch_s={r['batch_s']} "
              f"wall={r['leg_wall_s']}s", file=sys.stderr)

    best: dict[str, dict] = {}
    for key, ss in samples.items():
        b = dict(min(ss, key=lambda r: r["stream_s"] if r["stream_s"] > 0
                     else float("inf")))
        b["samples_stream_s"] = [r["stream_s"] for r in ss]
        if any(r["batch_s"] > 0 for r in ss):
            b["batch_s"] = min(r["batch_s"] for r in ss if r["batch_s"] > 0)
            b["samples_batch_s"] = [r["batch_s"] for r in ss]
        best[key] = b

    def tps(key):
        return n_turns / best[key]["stream_s"]

    def btps(key):
        return n_turns / best[key]["batch_s"]

    result = {
        "n_turns": n_turns,
        "configs": best,
        "pairs": {
            "fixed_trigger_4_16_mfpt32": round((tps("l16_m32") / tps("l4_m32")) / 4, 3),
            "scaled_trigger_4_16": round((tps("l16_m128") / tps("l4_m32")) / 4, 3),
            "proc_isolated_1x4_4x4_stream": round((tps("lc4x4") / tps("lc1x4")) / 4, 3),
            "proc_isolated_1x4_4x4_batch": round((btps("lc4x4") / btps("lc1x4")) / 4, 3),
        },
        "mfpt_sweep_local16_stream_s": {
            "32": best["l16_m32"]["stream_s"],
            "64": best["l16_m64"]["stream_s"],
            "128": best["l16_m128"]["stream_s"],
        },
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_attack.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
