"""Batch sequence detector + window aggregations + skew helpers."""

from __future__ import annotations

import pandas as pd

from logeventprocessor_spark.generator import make_transcripts, transcripts_df
from logeventprocessor_spark.operators.match import match_turns
from logeventprocessor_spark.operators.sequence import sequence_detect
from logeventprocessor_spark.operators.skew import salted_two_phase_agg
from logeventprocessor_spark.operators import windows as Wops
from logeventprocessor_spark.oracle import oracle_sequence_pairs
from logeventprocessor_spark.rules import canonical_rules


def test_batch_sequence_equals_oracle(spark):
    pdf = make_transcripts(n_convs=25, seed=5)
    rules = canonical_rules()
    matches = match_turns(transcripts_df(spark, pdf), rules)
    got = (
        sequence_detect(matches, "error_detection", "test", within_ms=120_000)
        .toPandas()
        .sort_values(["conv_id", "b_turn_idx"])
        .reset_index(drop=True)
    )
    exp = oracle_sequence_pairs(
        matches.toPandas(), "error_detection", "test", within_ms=120_000
    )
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns].astype(exp.dtypes.to_dict()), exp)


def test_same_turn_a_qualifies(spark):
    """A and B firing the same turn: A counts as preceding (ts_a <= ts_b)."""
    from logeventprocessor_spark.rules import Rule, RuleStep

    rules = [
        Rule("a", 0, "alpha", steps=(RuleStep(0, "text", "x"),)),
        Rule("b", 1, "beta", steps=(RuleStep(0, "text", "y"),)),
    ]
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"],
            "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"],
            "text": ["alpha and beta together"],
            "tool": [""],
            "ts": pd.to_datetime(["2024-03-01"]).astype("datetime64[us]"),
        }
    )
    matches = match_turns(transcripts_df(spark, pdf), rules)
    got = sequence_detect(matches, "a", "b", within_ms=1000).toPandas()
    exp = oracle_sequence_pairs(matches.toPandas(), "a", "b", within_ms=1000)
    assert len(got) == len(exp) == 1
    assert got.iloc[0]["a_turn_idx"] == 0 and got.iloc[0]["b_turn_idx"] == 0


def test_tumbling_window_counts(spark):
    pdf = make_transcripts(n_convs=10, seed=9)
    turns = transcripts_df(spark, pdf)
    got = Wops.tumbling(turns, "ts", "10 minutes").toPandas()
    exp = (
        pdf.assign(w=pdf.ts.dt.floor("10min"))
        .groupby("w")
        .size()
        .reset_index(name="n")
    )
    merged = got.merge(exp, left_on="window_start", right_on="w", how="outer")
    assert (merged["n_events"].fillna(-1) == merged["n"].fillna(-1)).all()
    # window_end - window_start == 10 min everywhere
    assert (
        (got["window_end"] - got["window_start"]) == pd.Timedelta("10min")
    ).all()


def test_sliding_window_multiplicity(spark):
    """1 h window sliding 30 min: every event lands in exactly 2 windows."""
    pdf = make_transcripts(n_convs=8, seed=13)
    turns = transcripts_df(spark, pdf)
    got = Wops.sliding(turns, "ts", "1 hour", "30 minutes").toPandas()
    assert got["n_events"].sum() == 2 * len(pdf)


def test_session_window_against_pandas(spark):
    """Session = maximal runs with gaps < 5 min; end = last ts + gap."""
    pdf = make_transcripts(n_convs=10, seed=21)
    turns = transcripts_df(spark, pdf)
    got = (
        Wops.session(turns, "ts", "5 minutes", keys=["conv_id"])
        .toPandas()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )

    def sessions(g):
        g = g.sort_values("ts")
        gap = pd.Timedelta("5min")
        new = (g.ts.diff() >= gap).cumsum()
        return g.groupby(new).agg(
            session_start=("ts", "min"), last_ts=("ts", "max"), n_events=("ts", "size")
        )

    exp = (
        pdf.groupby("conv_id")[["ts"]]
        .apply(sessions)
        .reset_index()
        .assign(session_end=lambda d: d.last_ts + pd.Timedelta("5min"))
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    cols = ["conv_id", "session_start", "session_end", "n_events"]
    pd.testing.assert_frame_equal(
        got[cols].astype({"session_start": "datetime64[ns]",
                          "session_end": "datetime64[ns]"}),
        exp[cols].astype({"n_events": "int64",
                          "session_start": "datetime64[ns]",
                          "session_end": "datetime64[ns]"}),
    )


def test_salted_agg_equals_plain_agg(spark):
    from pyspark.sql import functions as F

    pdf = make_transcripts(n_convs=12, seed=17)
    turns = transcripts_df(spark, pdf).withColumn("v", F.col("turn_idx") * 1.5)
    got = (
        salted_two_phase_agg(turns, "conv_id", 8, sum_cols=["v"],
                             det_cols=["turn_idx"])
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    exp = (
        pdf.assign(v=pdf.turn_idx * 1.5)
        .groupby("conv_id")
        .agg(n_events=("v", "size"), sum_v=("v", "sum"))
        .reset_index()
    )
    assert (got["n_events"].values == exp["n_events"].values).all()
    assert abs(got["sum_v"].values - exp["sum_v"].values).max() < 1e-6
