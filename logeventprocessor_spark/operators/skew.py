"""Skew handling for long conversations (SURVEY.md 4 O11; north-rule
"partitioning / shuffle / skew handled explicitly").

A 10^12-turn table with power-law conversation lengths pins whole
executors if keyed work shuffles raw ``conv_id``. Two mitigations,
used where semantics allow:

* ``salted_two_phase_agg`` -- for ALGEBRAIC aggregates (count/sum/min/
  max) keyed by conv_id: aggregate on (conv_id, salt) first (splits a
  mega-conversation across S reducers), then combine per conv_id. The
  second shuffle moves only S rows per conversation.
* AQE skew-join splitting is enabled globally in session.py
  (``spark.sql.adaptive.skewJoin.enabled``) for the join-back-to-
  context and other shuffle joins.

Order-dependent keyed state (cooldown, sequence) canNOT be salted --
its semantics are a sequential scan per key. There the mitigation is
that only cooldown-bearing rule hits shuffle at all
(operators/cooldown.py) and state is O(1) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int, det_cols: list[str] | None = None):
    """Add a salt column. With ``det_cols`` the salt is a deterministic
    hash of those columns (reproducible plans, e.g. pmod(hash(turn_idx),
    S)); otherwise uniform random."""
    if det_cols:
        salt = F.pmod(F.hash(*det_cols), F.lit(n_salts))
    else:
        salt = (F.rand(seed=42) * n_salts).cast("int")
    return df.withColumn(SALT_COL, salt)


# AQE skew-join demonstration: thresholds scaled DOWN so a local-mode
# fixture (tens of MB) trips the same detector that fires on skewed
# multi-GB partitions on a cluster. A shuffle partition is split when
# size > factor * median AND size > thresholdInBytes; split chunks are
# advisory-sized.
SKEW_DEMO_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


def skew_join_demo(spark, n_rows: int = 400_000, n_keys: int = 1_000):
    """A deliberately skewed shuffle join: 60% of the left rows share
    ONE key (a mega-conversation), the rest spread over ``n_keys``.
    Under SKEW_DEMO_CONF, AQE's runtime re-plan splits the hot
    partition into advisory-sized chunks and replicates the matching
    right side -- the executed plan shows ``SortMergeJoin ... skew=true``
    (assert after an action; AQE plans at runtime). Caveat for
    consumers: the verifying action must CONSUME ``pad`` (e.g.
    ``sum(crc32(pad))``) -- a bare count() lets column pruning drop
    the padding from the shuffle and the partitions are no longer
    skewed in bytes (observed: max partition 110 KB vs 31 MB). This is the
    mitigation for joins whose keys canNOT be salted because the join
    key is the semantic identity (e.g. match-back-to-context on
    conv_id when one conversation is 10^8 turns)."""
    left = spark.range(0, n_rows).select(
        F.when(F.col("id") % 10 < 6, F.lit(0))
        .otherwise(F.col("id") % n_keys + 1)
        .alias("k"),
        F.col("id").alias("v"),
        # INCOMPRESSIBLE padding: skew detection reads compressed map
        # output sizes, so repetitive padding would compress below the
        # threshold and mask the skew (observed: 'x'*96 -> coalesce,
        # no split)
        F.sha2(F.concat(F.col("id").cast("string"), F.lit("|pad")), 512)
        .alias("pad"),
    )
    right = spark.range(0, n_keys + 1).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return left.join(right, "k")


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    n_salts: int,
    sum_cols: list[str] | None = None,
    det_cols: list[str] | None = None,
) -> DataFrame:
    """count(*) and sum(cols) per ``key``, skew-safe."""
    sum_cols = sum_cols or []
    partial = (
        with_salt(df, n_salts, det_cols)
        .groupBy(key, SALT_COL)
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            *[F.sum(c).alias(f"_sum_{c}") for c in sum_cols],
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("n_events"),
        *[F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
