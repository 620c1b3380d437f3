"""Spark-free host-scaling probes (round-5 verdict tasks #3/#8).

The process-isolated local-cluster pair (scripts/scaling_lc.py) shows
the pure-JVM control scaling at 0.92 while the Python-boundary
pipelines sit at 0.60-0.64 -- so the deficit is NOT JVM-sharing or the
scheduler. These two probes bound how much of it is the host itself:

* ``membw``: P processes each memcpy a 256 MB buffer for ~6 s;
  aggregate GB/s at P=4 vs P=16 measures the DRAM-bandwidth tax any
  memory-intensive multi-process work pays on one host.
* ``arrow``: P processes each loop Arrow IPC serialize+deserialize of
  a text-heavy RecordBatch (the shape the match boundary ships);
  aggregate rows/s at P=4 vs P=16 measures how the Arrow
  encode/decode path itself scales.

Workers are independent OS processes spawned via subprocess (this
sandbox deadlocks multiprocessing+pyarrow children under both fork
and spawn), alternated 4,16,4,16 with best-of so host drift is
visible rather than folded in.

Run: python scripts/host_probes.py   (writes BENCH/host_probes.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_MEMBW_WORKER = r"""
import sys, time
import numpy as np
src = np.frombuffer(np.random.bytes(256 * 1024 * 1024), dtype=np.uint8)
dst = np.empty_like(src)
dur = float(sys.argv[1]); t_end = time.time() + dur
n = 0
while time.time() < t_end:
    np.copyto(dst, src)
    n += 1
open(sys.argv[2], "w").write(str(n * src.nbytes * 2))  # read+write bytes
"""

_ARROW_WORKER = r"""
import sys, time
import pyarrow as pa
n = 100_000
texts = [f"user turn {i} please run tool search with query q{i%97} and report"
         for i in range(n)]
b = pa.record_batch(
    [pa.array([f"c{i%5000}" for i in range(n)]),
     pa.array(list(range(n)), pa.int32()),
     pa.array(texts)],
    names=["conv_id", "turn_idx", "text"])
dur = float(sys.argv[1]); t_end = time.time() + dur
rows = 0
while time.time() < t_end:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, b.schema) as w:
        w.write_batch(b)
    with pa.ipc.open_stream(sink.getvalue()) as r:
        for rb in r:
            rows += rb.num_rows
open(sys.argv[2], "w").write(str(rows))
"""


def _measure(worker_src: str, n_procs: int, dur: float = 6.0) -> float:
    """Aggregate per-second counter across n_procs independent
    interpreter processes running worker_src for dur seconds."""
    with tempfile.TemporaryDirectory(prefix="hostprobe_") as tmp:
        script = os.path.join(tmp, "w.py")
        with open(script, "w") as f:
            f.write(worker_src)
        procs = [
            subprocess.Popen([sys.executable, script, str(dur),
                              os.path.join(tmp, f"out{i}")])
            for i in range(n_procs)
        ]
        for p in procs:
            p.wait(timeout=120)
        total = sum(
            int(open(os.path.join(tmp, f"out{i}")).read())
            for i in range(n_procs)
        )
    return total / dur


def run_probe(worker_src: str) -> dict:
    samples: dict[int, list[float]] = {4: [], 16: []}
    for p in (4, 16, 4, 16):  # alternate to absorb host drift
        samples[p].append(round(_measure(worker_src, p), 1))
    b4, b16 = max(samples[4]), max(samples[16])
    return {
        "per_config": {str(k): v for k, v in samples.items()},
        "best_4": b4,
        "best_16": b16,
        "eff_4_to_16": round(b16 / b4 / 4, 3),
    }


def main():
    result = {
        "membw_bytes_per_s": run_probe(_MEMBW_WORKER),
        "arrow_serde_rows_per_s": run_probe(_ARROW_WORKER),
    }
    out = os.path.join(REPO, "BENCH", "host_probes.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
