"""Adjudicate the r4->r5 cep_batch_pipeline regression (round-5
verdict task #3): +55% (2.34 -> 3.63 s at sf0.1) landed together with
fixture v2's rate_guard rule AND a documented degraded-host window --
this A/B separates them on one idle host in one process.

Three rule sets over the IDENTICAL corpus parquet, interleaved
A,B,C,A,B,C,... so host drift hits all arms equally:

  A  "v1 rules": canonical minus rate_guard minus pin_code (the r4 set)
  B  "v2 rules": canonical minus pin_code            (the r5 set)
  C  "v3 rules": full canonical                      (the r6 set)

B-A is the marginal cost of the rate_guard rule (one more regex pass +
a second hot cooldown chain); C-B is the marginal cost of the
no-literal pin_code rule (safe-subset RLIKE prefilter + pandas
fallback). The host probe stamps before/after certify the host was
healthy. Writes BENCH/batch_ab.json.

Run: python scripts/batch_ab.py   (env: SPARK_GRAFT_SF_DIR, _CPUS)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _host_probe  # noqa: E402
from logeventprocessor_spark.generator import (  # noqa: E402
    make_transcripts_fast,
    write_transcripts_parquet,
)
from logeventprocessor_spark.pipeline import match_actions  # noqa: E402
from logeventprocessor_spark.rules import canonical_rules  # noqa: E402
from logeventprocessor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_SF = float(SF_DIR.rstrip("/").split("sf")[-1]) if "sf" in SF_DIR else 0.1
N_CONVS = max(400, int(200_000 * _SF))
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "5"))


def main():
    spark = get_spark(
        "batch_ab", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    full = canonical_rules()
    arms = {
        "A_v1_rules": [r for r in full
                       if r.rule_id not in ("rate_guard", "pin_code")],
        "B_v2_rules": [r for r in full if r.rule_id != "pin_code"],
        "C_v3_rules": full,
    }
    probe_before = _host_probe()
    pdf = make_transcripts_fast(n_convs=N_CONVS, mean_turns=48, seed=42)
    n_turns = len(pdf)
    tmp = tempfile.mkdtemp(prefix="batch_ab_")
    results: dict[str, list[float]] = {k: [] for k in arms}
    try:
        write_transcripts_parquet(pdf, f"{tmp}/turns", n_files=max(CPUS * 2, 16))
        del pdf
        turns = spark.read.parquet(f"{tmp}/turns")
        turns.count()
        acts = {k: match_actions(turns, rs, with_cooldown=True)
                for k, rs in arms.items()}
        counts = {k: a.count() for k, a in acts.items()}  # warm + volume
        for _ in range(ROUNDS):
            for k in arms:  # interleaved: drift hits all arms equally
                t0 = time.time()
                acts[k].write.format("noop").mode("overwrite").save()
                results[k].append(round(time.time() - t0, 3))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    probe_after = _host_probe()
    med = {k: round(statistics.median(v), 3) for k, v in results.items()}
    doc = {
        "sf": _SF, "cpus": CPUS, "n_turns": n_turns,
        "median_s": med, "runs": results, "n_match_rows": counts,
        "marginal_rate_guard_s": round(med["B_v2_rules"] - med["A_v1_rules"], 3),
        "marginal_pin_code_s": round(med["C_v3_rules"] - med["B_v2_rules"], 3),
        "host_probe": {"before": probe_before, "after": probe_after},
    }
    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH"), exist_ok=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "batch_ab.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
