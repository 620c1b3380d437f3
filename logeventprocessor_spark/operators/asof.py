"""As-of join (SURVEY.md 2.6 joins row): for every left row, the
LATEST right row of the same key with right.ts <= left.ts (within an
optional tolerance).

Spark has no native ASOF JOIN; the scalable batch realization is the
union + running ``last(ignorenulls)`` trick: tag both sides, sort per
key by (ts, side), and carry the most recent right row forward. ONE
shuffle on the key, no range-join explosion -- at 100 TB this beats an
interval join whose candidate window would multiply rows.

(DuckDB HAS native ASOF JOIN -- used as the independent oracle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Returns ``left`` columns + the as-of matched ``right_cols``
    (null when no right row precedes). Right columns are prefixed
    ``asof_``."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*right_cols).alias("_r"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts => right at the same
    # instant is visible to the left row (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    carried = carried.withColumn(
        "_last_r_ts",
        F.last(F.when(F.col("_is_left") == 0, F.col("_ts")), ignorenulls=True).over(w),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_ms is not None:
        # Integer microsecond difference -- double-precision epoch
        # subtraction has ~2.4e-7 s resolution and can flip a pair
        # landing EXACTLY on the tolerance boundary against the
        # oracle's exact INTERVAL arithmetic (same fix as
        # sequence.py's gap math).
        within = (
            F.unix_micros(F.col("_ts").cast("timestamp"))
            - F.unix_micros(F.col("_last_r_ts").cast("timestamp"))
        ) <= F.lit(tolerance_ms).cast("long") * F.lit(1000).cast("long")
        out = out.withColumn(
            "_last_r", F.when(within, F.col("_last_r"))
        ).withColumn("_last_r_ts", F.when(within, F.col("_last_r_ts")))
    sel = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    sel += [F.col(f"_last_r.{c}").alias(f"asof_{c}") for c in right_cols]
    sel += [F.col("_last_r_ts").alias("asof_ts")]
    return out.select(*sel)
