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
