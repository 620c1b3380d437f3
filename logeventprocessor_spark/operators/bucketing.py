"""Bucketed tables: pre-shuffled, co-located joins (SURVEY.md 7.1;
task-brief scale technique alongside broadcast and salting).

At 100 TB, repeatedly joining fact tables on the same key pays a full
shuffle per query. Writing both sides ``bucketBy(n, key)`` (hash-
partitioned into a fixed bucket count at WRITE time, recorded in the
table catalog) lets every later equi-join on that key run as a
sort-merge join with NO Exchange on either side -- the buckets line up
one-to-one. ``assert_no_shuffle_join`` is the test hook proving it.

Spark specifics honored here:
* bucketing requires ``saveAsTable`` (the bucket spec lives in the
  catalog, not in parquet files);
* both sides must have the SAME bucket count on the SAME columns;
* ``sortBy`` within buckets removes even the per-task Sort for the
  merge join when the sort columns cover the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) table."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two same-bucketed tables; plans with zero Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)


def plan_has_shuffle(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
