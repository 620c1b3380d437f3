"""Focused north-rule pair: batch+stream throughput at local[4] vs
local[16] on the full 26M-turn input (the size where per-run fixed
costs are diluted; at 13M turns a ~1.5 s fixed cost inside a 6.7 s
16-core run understates the ratio by construction). Legs interleaved
[4,16,16,4], best-of per config -- same drift defense as
scaling_bench, without the (8,32) oversubscribed pair and without the
pure-JVM control (established in rounds 4-5; unchanged by this
round's code).

Run: python scripts/scaling_pair.py [n_convs]
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
    make_transcripts_fast,
    write_transcripts_parquet,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, input_dir: str) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM="64g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/scaling_worker.py"),
         str(cpus), input_dir, "--runs=3", "--legs=batch,stream"],
        capture_output=True, text=True, timeout=3600, cwd=REPO, env=env,
    )
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(
            f"scaling_worker cpus={cpus} failed rc={out.returncode}: "
            f"{out.stderr[-2000:]}"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    tmp = tempfile.mkdtemp(prefix="scalingpair_")
    pdf = make_transcripts_fast(n_convs=n_convs, mean_turns=48, seed=42)
    n_turns = len(pdf)
    write_transcripts_parquet(pdf, f"{tmp}/turns", n_files=128)
    del pdf

    samples: dict[int, list[dict]] = {4: [], 16: []}
    for c in (4, 16, 16, 4):
        samples[c].append(run_at(c, f"{tmp}/turns"))
    best = {
        c: {
            "batch_s": min(r["batch_s"] for r in ss),
            "stream_s": min(r["stream_s"] for r in ss),
            "samples_batch_s": [r["batch_s"] for r in ss],
            "samples_stream_s": [r["stream_s"] for r in ss],
            "n_input_splits": ss[0]["n_input_splits"],
        }
        for c, ss in samples.items()
    }
    doc = {
        "n_turns": n_turns,
        "runs": best,
        "throughput": {
            c: {
                "batch_turns_per_sec": round(n_turns / r["batch_s"], 1),
                "stream_turns_per_sec": round(n_turns / r["stream_s"], 1),
            }
            for c, r in best.items()
        },
        "eff_4_to_16_batch": round(
            (best[4]["batch_s"] / best[16]["batch_s"]) / 4, 3
        ),
        "eff_4_to_16_stream": round(
            (best[4]["stream_s"] / best[16]["stream_s"]) / 4, 3
        ),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_pair.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
