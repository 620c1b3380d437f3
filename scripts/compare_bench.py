"""Cross-round bench comparison WITH a host-health gate (round-5
verdict task #6): two of the last three rounds hinged on "was the host
degraded?" -- this script makes that measured instead of argued.

Usage: python scripts/compare_bench.py BENCH_rA.json BENCH_rB.json

Prints the per-shared-query deltas and totals, but REFUSES to draw a
conclusion (exit code 2) when the two runs' Arrow-IPC host probes
disagree by more than 20%, or when either run flagged itself against
its rolling probe history -- in that state a delta is host drift until
re-measured on a healthy host, not a regression.
"""

from __future__ import annotations

import json
import sys

PROBE_TOL = 0.2


def _probe_value(doc: dict) -> float | None:
    p = doc.get("host_probe")
    if not p:
        return None
    vals = [
        v
        for k, v in p.items()
        if k.startswith("arrow_rows_per_s") and isinstance(v, (int, float))
    ]
    return sum(vals) / len(vals) if vals else None


def _load(path: str) -> dict:
    doc = json.load(open(path))
    # driver BENCH_r{N}.json wraps the summary line under "parsed"
    return doc.get("parsed") or doc


def main(path_a: str, path_b: str) -> int:
    a = _load(path_a)
    b = _load(path_b)
    qa, qb = a.get("queries", {}), b.get("queries", {})
    if not (qa and qb):
        print("no shared query timings parsed; nothing to compare")
        return 1
    shared = sorted(set(qa) & set(qb))
    print(f"{'query':38s} {'A (s)':>8s} {'B (s)':>8s} {'delta':>8s}")
    ta = tb = 0.0
    for q in shared:
        ta += qa[q]
        tb += qb[q]
        d = qb[q] - qa[q]
        pct = f"{d / qa[q] * 100:+.0f}%" if qa[q] else "n/a"
        print(f"{q:38s} {qa[q]:8.3f} {qb[q]:8.3f} {pct:>8s}")
    print(f"{'SHARED TOTAL':38s} {ta:8.3f} {tb:8.3f} "
          f"{(tb - ta) / ta * 100:+.0f}%")
    only_b = sorted(set(qb) - set(qa))
    if only_b:
        print(f"new in B (excluded from total): {', '.join(only_b)}")

    pa_, pb_ = _probe_value(a), _probe_value(b)
    flagged = (a.get("host_probe") or {}).get("flagged") or (
        b.get("host_probe") or {}
    ).get("flagged")
    if pa_ is None or pb_ is None:
        print("HOST GATE: missing probe in at least one run -- "
              "comparison is ADVISORY ONLY (pre-probe artifact).")
        return 0
    dev = abs(pb_ - pa_) / max(pa_, pb_)
    print(f"host probe A={pa_:.0f} B={pb_:.0f} rows/s "
          f"(deviation {dev * 100:.0f}%, flagged={bool(flagged)})")
    if dev > PROBE_TOL or flagged:
        print("HOST GATE: REFUSED -- probes disagree >20% or a run is "
              "flagged vs its rolling history; deltas above are host "
              "drift until re-measured on a healthy host.")
        return 2
    print("HOST GATE: ok -- both runs on comparably healthy host; "
          "deltas above are attributable to code/data changes.")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
