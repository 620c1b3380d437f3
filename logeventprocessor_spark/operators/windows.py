"""Time-window aggregations (SURVEY.md 2.6): tumbling, sliding,
session -- the general forms of the reference's implicit windows
(cooldown interval, 5 s poll, 10 s status tick).

All pure built-ins (``F.window`` / ``F.session_window``): Catalyst
plans partial+final HashAggregate automatically, so these scale with
no custom code. Usable on both batch and streaming DataFrames (on
streams, add ``withWatermark`` upstream for state eviction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg(df: DataFrame, group_cols: list, value_col: str | None):
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    return df.groupBy(*group_cols).agg(*aggs)


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str] | None = None,
    value_col: str | None = None,
) -> DataFrame:
    g = _agg(df, [F.window(ts_col, duration), *(keys or [])], value_col)
    return g.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(keys or []),
        "n_events",
        *(["sum_value"] if value_col else []),
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str] | None = None,
    value_col: str | None = None,
) -> DataFrame:
    g = _agg(df, [F.window(ts_col, duration, slide), *(keys or [])], value_col)
    return g.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(keys or []),
        "n_events",
        *(["sum_value"] if value_col else []),
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    value_col: str | None = None,
) -> DataFrame:
    """Session windows keyed by ``keys`` with inactivity gap ``gap``;
    session_end = last event ts + gap (Spark session_window contract).
    """
    g = _agg(df, [F.session_window(ts_col, gap), *keys], value_col)
    return g.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        "n_events",
        *(["sum_value"] if value_col else []),
    )
