"""Decompose the batch pipeline's serial floor C (round-2 verdict
task #8): run the pipeline stages on a TINY input (W ~= 0, so wall
time ~= C) and on the bench input, under config variants, to attribute
C to its components.

    python scripts/batch_floor.py [cpus]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logeventprocessor_spark.generator import make_transcripts_fast  # noqa: E402
from logeventprocessor_spark.operators.cooldown import apply_cooldown  # noqa: E402
from logeventprocessor_spark.operators.match import match_turns  # noqa: E402
from logeventprocessor_spark.operators.steps import expand_steps  # noqa: E402
from logeventprocessor_spark.pipeline import match_actions  # noqa: E402
from logeventprocessor_spark.rules import canonical_rules  # noqa: E402
from logeventprocessor_spark.session import get_spark  # noqa: E402


def med(fn, n=7):
    xs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        xs.append(time.time() - t0)
    return statistics.median(xs)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(
        f"floor-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    rules = canonical_rules()
    import tempfile

    import pandas as pd  # noqa: F401

    tiny_pdf = make_transcripts_fast(n_convs=100, mean_turns=48, seed=42)
    tmp = tempfile.mkdtemp(prefix="floor_")
    tiny_pdf.to_parquet(f"{tmp}/tiny.parquet", index=False)
    tiny = spark.read.parquet(f"{tmp}/tiny.parquet")
    tiny.count()

    # warm all paths
    match_actions(tiny, rules, with_cooldown=True).count()

    t_job = med(lambda: spark.range(16).count())
    t_scan = med(lambda: tiny.count())
    t_match = med(lambda: match_turns(tiny, rules).count())
    t_cd = med(lambda: apply_cooldown(match_turns(tiny, rules), rules).count())
    t_full = med(lambda: match_actions(tiny, rules).count())

    print(f"[local[{cpus}] tiny input ({len(tiny_pdf)} turns): wall ~= serial floor C]")
    print(f"  bare job submit+count        : {t_job:.3f}s")
    print(f"  parquet scan+count           : {t_scan:.3f}s")
    print(f"  + match (mapInPandas)        : {t_match:.3f}s")
    print(f"  + cooldown (shuffle+mapInPd) : {t_cd:.3f}s")
    print(f"  + steps broadcast join       : {t_full:.3f}s  <- C")

    # variants on the full pipeline, tiny input
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    match_actions(tiny, rules).count()
    t_noaqe = med(lambda: match_actions(tiny, rules).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # pre-created steps frame: is createDataFrame+broadcast in C?
    from logeventprocessor_spark.operators import steps as steps_mod

    sdf = steps_mod.steps_df(spark, rules).localCheckpoint()
    orig = steps_mod.steps_df
    steps_mod.steps_df = lambda s, r: sdf
    match_actions(tiny, rules).count()
    t_presteps = med(lambda: match_actions(tiny, rules).count())
    steps_mod.steps_df = orig

    # fewer shuffle partitions for the tiny cooldown shuffle
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    match_actions(tiny, rules).count()
    t_fewshuf = med(lambda: match_actions(tiny, rules).count())
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))

    print(f"  full, AQE off                : {t_noaqe:.3f}s")
    print(f"  full, steps_df pre-created   : {t_presteps:.3f}s")
    print(f"  full, shuffle.partitions=4   : {t_fewshuf:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
