"""Two-parallelism scaling evidence (sandbox proxy for N vs 4N
executors, per BASELINE.md): run the identical CEP pipeline (batch +
streaming) on the identical input at local[8] and local[32] in
separate JVMs, report throughput at both plus scaling efficiency
(thr_4N / thr_N) / 4, and write BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_convs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logeventprocessor_spark.generator import (  # noqa: E402
    make_transcripts,
    write_transcripts_parquet,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, input_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/scaling_worker.py"),
         str(cpus), input_dir],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    tmp = tempfile.mkdtemp(prefix="scaling_")
    pdf = make_transcripts(n_convs=n_convs, mean_turns=48, seed=42)
    n_turns = len(pdf)
    write_transcripts_parquet(pdf, f"{tmp}/turns", n_files=64)
    del pdf

    r8 = run_at(8, f"{tmp}/turns")
    r32 = run_at(32, f"{tmp}/turns")

    def thr(r, key):
        return r["n_turns"] / r[key]

    eff_batch = (thr(r32, "batch_s") / thr(r8, "batch_s")) / 4
    eff_stream = (thr(r32, "stream_s") / thr(r8, "stream_s")) / 4

    result = {
        "n_turns": n_turns,
        "n_actions": r32["n_actions"],
        "local8": r8,
        "local32": r32,
        "batch_turns_per_sec_8": round(thr(r8, "batch_s"), 1),
        "batch_turns_per_sec_32": round(thr(r32, "batch_s"), 1),
        "stream_turns_per_sec_8": round(thr(r8, "stream_s"), 1),
        "stream_turns_per_sec_32": round(thr(r32, "stream_s"), 1),
        "scaling_efficiency_batch": round(eff_batch, 3),
        "scaling_efficiency_stream": round(eff_stream, 3),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result, indent=2))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured performance of the engine

Protocol (BASELINE.md): identical deterministic transcript stream
(seed=42, {n_turns} turns, {r32['n_actions']} match-output rows),
identical rule set (canonical corpus incl. cooldown rule), same input
parquet ({64} files), run at two parallelism levels in separate JVMs
as the sandbox proxy for N vs 4N executors.

| config | batch pipeline | batch turns/s | streaming pipeline | stream turns/s |
|---|---|---|---|---|
| local[8]  | {r8['batch_s']} s | {result['batch_turns_per_sec_8']} | {r8['stream_s']} s | {result['stream_turns_per_sec_8']} |
| local[32] | {r32['batch_s']} s | {result['batch_turns_per_sec_32']} | {r32['stream_s']} s | {result['stream_turns_per_sec_32']} |

**Scaling efficiency (thr_4N / thr_N) / 4:**
batch = {result['scaling_efficiency_batch']}, streaming = {result['scaling_efficiency_stream']}
(target >= 0.8 per BASELINE.json north_rule; local-mode caveat: all
"executors" share one JVM heap, one shuffle disk, and Python worker
startup, so local scaling understates multi-node scaling for this
shuffle-light pipeline).

Raw: `{json.dumps(result)}`

Measured {result['ts']} on local[8]/local[32], 32-core host.
""")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
