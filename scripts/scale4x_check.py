"""Scale-holding check for the shingle/SimHash pair operators: run
each at 1x (the sf0.1 documents table) and at 4x volume and report the
wall-clock ratio. The 4x corpus is FOUR DISJOINT SHARDS of the 1x
table (copy k suffixes every word with 'xk' and offsets doc_id), so
within-shard similarity structure is identical to 1x and cross-shard
similarity is zero -- pair count and candidate volume scale exactly 4x
while density stays constant, which is the honest volume test (a
verbatim 4x replication would instead quadruple the similarity DENSITY
and measure a different workload).

Writes BENCH/scaling_docs_r07b.json. Run AFTER bench.py finishes,
never concurrently. Usage: python scripts/scale4x_check.py
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

from pyspark.sql import functions as F  # noqa: E402

from logeventprocessor_spark.operators import dedup as D  # noqa: E402
from logeventprocessor_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "4"))


def main():
    spark = get_spark(
        "scale4x", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    docs1 = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n1 = docs1.count()
    tmp = tempfile.mkdtemp(prefix="scale4x_")
    out = {}
    try:
        shards = []
        for k in range(4):
            s = docs1.select(
                (F.col("doc_id") + F.lit(k * n1)).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{k}").alias(
                    "text"
                ),
            )
            shards.append(s)
        big = shards[0]
        for s in shards[1:]:
            big = big.unionByName(s)
        big.write.mode("overwrite").parquet(f"{tmp}/docs4x")
        docs4 = spark.read.parquet(f"{tmp}/docs4x")
        n4 = docs4.count()
        print(f"1x={n1} docs, 4x={n4} docs")

        cases = {
            "ngram_jaccard_pairs": lambda d: D.ngram_jaccard_pairs(
                d, threshold=0.6
            ),
            "minhash_lsh_pairs": lambda d: D.minhash_lsh_pairs(
                d, k=32, bands=8, threshold=0.6
            ),
            "simhash_md5_pairs": lambda d: D.simhash_md5_pairs(
                d, max_hamming=3, compound=True
            ),
        }
        for name, fn in cases.items():
            for tag, d in (("1x", docs1), ("4x", docs4)):
                xs = []
                for _ in range(RUNS):
                    t0 = time.time()
                    fn(d).write.format("noop").mode("overwrite").save()
                    xs.append(round(time.time() - t0, 2))
                # median of the post-warmup samples (run 0 pays codegen)
                med = round(statistics.median(xs[1:]), 2)
                out[f"{name}_{tag}"] = {"samples": xs, "med2": med}
                print(name, tag, xs, "->", med)
        for name in cases:
            r = out[f"{name}_4x"]["med2"] / out[f"{name}_1x"]["med2"]
            out[f"{name}_ratio"] = round(r, 2)
            print(f"{name}: 4x/1x wall ratio = {r:.2f}")
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/scaling_docs_r07b.json", "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
