"""Focused process-isolation scaling pair (round-4 verdict task #8),
fixing two confounds in the first scaling_attack run:

* ALTERNATION: the attack's mirrored schedule placed the two lc4x4
  samples back-to-back, so a host-drift window hit both; here the
  1-executor and 4-executor legs strictly alternate, twice each.
* MEMORY: 10 GB workers left the 1-executor leg GC-bound at 25M turns
  (96-124 s batch vs 46 s for the shared-heap local[4] in round 4).
  Workers get 22 GB each -- per-executor (and per-core) memory is
  IDENTICAL across legs, which is exactly how a real cluster scales:
  adding executors adds memory with them.

Each leg also runs the pure-JVM control (match_turns_sql) INSIDE the
same process-isolated topology, so any residual host drift between
legs is visible and the Python-boundary share can be separated from
host effects. A trigger-scaled 4-executor leg (mfpt=128, constant
files-per-core vs the 1-executor mfpt=32 leg) mirrors how a real 4x
cluster ingests 4x rows per trigger at constant latency.

Run: python scripts/scaling_lc.py [n_convs]   (writes BENCH/scaling_lc.json)
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

MEM_MB = 22528  # 22 GB/worker: 4 workers + 16 GB driver < host RAM


def run_leg(master: str, input_dir: str, mfpt: int, legs: str) -> dict:
    args = [sys.executable, os.path.join(REPO, "scripts/scaling_worker.py"),
            master, input_dir, f"--mfpt={mfpt}", f"--legs={legs}", "--runs=2"]
    env = dict(os.environ, SPARK_DRIVER_MEM="16g")
    out = subprocess.run(args, capture_output=True, text=True,
                         timeout=3600, cwd=REPO, env=env)
    if out.returncode != 0:
        raise RuntimeError(f"leg {master} failed:\n{out.stderr[-4000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    tmp = tempfile.mkdtemp(prefix="scalelc_")
    pdf = make_transcripts_fast(n_convs=n_convs, mean_turns=48, seed=42)
    n_turns = len(pdf)
    write_transcripts_parquet(pdf, f"{tmp}/turns", n_files=128)
    del pdf
    inp = f"{tmp}/turns"

    one = f"local-cluster[1,4,{MEM_MB}]"
    four = f"local-cluster[4,4,{MEM_MB}]"
    # strict alternation, two samples per config; the trigger-scaled
    # 4x leg rides the same alternation
    schedule = [
        ("lc1x4", one, 32, "batch,stream,jvm"),
        ("lc4x4", four, 32, "batch,stream,jvm"),
        ("lc4x4_m128", four, 128, "stream"),
        ("lc1x4", one, 32, "batch,stream,jvm"),
        ("lc4x4", four, 32, "batch,stream,jvm"),
        ("lc4x4_m128", four, 128, "stream"),
    ]
    samples: dict[str, list[dict]] = {}
    for key, master, mfpt, legs in schedule:
        t0 = time.time()
        r = run_leg(master, inp, mfpt, legs)
        r["leg_wall_s"] = round(time.time() - t0, 1)
        samples.setdefault(key, []).append(r)
        print(f"# {key}: stream_s={r['stream_s']} batch_s={r['batch_s']} "
              f"jvm_s={r['jvm_match_s']} wall={r['leg_wall_s']}s",
              file=sys.stderr, flush=True)

    best: dict[str, dict] = {}
    for key, ss in samples.items():
        b = dict(ss[0])
        for k in ("batch_s", "stream_s", "jvm_match_s"):
            vals = [r[k] for r in ss if r[k] > 0]
            b[k] = min(vals) if vals else -1.0
            b[f"samples_{k}"] = [r[k] for r in ss]
        best[key] = b

    def eff(k4, k1, field):
        return round((best[k1][field] / best[k4][field]) / 4, 3)

    result = {
        "n_turns": n_turns,
        "mem_mb_per_worker": MEM_MB,
        "configs": best,
        "pairs": {
            "stream_1x4_to_4x4": eff("lc4x4", "lc1x4", "stream_s"),
            "stream_1x4_to_4x4_scaled_trigger": eff(
                "lc4x4_m128", "lc1x4", "stream_s"),
            "batch_1x4_to_4x4": eff("lc4x4", "lc1x4", "batch_s"),
            "jvm_control_1x4_to_4x4": eff("lc4x4", "lc1x4", "jvm_match_s"),
        },
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(REPO, "BENCH", "scaling_lc.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
