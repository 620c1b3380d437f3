"""Cooldown keyed-state operator edge cases (SURVEY.md 5.2 #2, T1)."""

from __future__ import annotations

import pandas as pd

from logeventprocessor_spark.generator import transcripts_df
from logeventprocessor_spark.operators.cooldown import apply_cooldown, suppress_group
from logeventprocessor_spark.operators.match import match_turns
from logeventprocessor_spark.oracle import oracle_matches
from logeventprocessor_spark.rules import Rule, RuleStep


def _turns(spark, texts_ts: list[tuple[str, str]], conv="c"):
    pdf = pd.DataFrame(
        {
            "conv_id": [conv] * len(texts_ts),
            "turn_idx": pd.array(range(len(texts_ts)), dtype="int32"),
            "role": ["user"] * len(texts_ts),
            "text": [t for t, _ in texts_ts],
            "tool": [""] * len(texts_ts),
            "ts": pd.to_datetime([ts for _, ts in texts_ts], format="mixed"),
        }
    )
    return pdf, transcripts_df(spark, pdf)


RULES = [
    Rule("ping", 0, "ping", cooldown_ms=5000, steps=(RuleStep(0, "command", "ack"),))
]


def test_exact_boundary_fires(spark):
    """elapsed == cooldown -> fires (>= semantics, pinned by oracle)."""
    pdf, turns = _turns(
        spark,
        [
            ("ping 1", "2024-03-01 00:00:00"),
            ("ping 2", "2024-03-01 00:00:05"),  # exactly 5000 ms -> fires
            ("ping 3", "2024-03-01 00:00:09.999"),  # 4999 ms -> suppressed
        ],
    )
    got = apply_cooldown(match_turns(turns, RULES), RULES).toPandas()
    assert sorted(got["turn_idx"].tolist()) == [0, 1]
    exp = oracle_matches(pdf, RULES)
    assert sorted(exp["turn_idx"].tolist()) == [0, 1]


def test_suppressed_fire_does_not_reset_clock(spark):
    """t=0 fires; t=3s suppressed; t=6s fires BECAUSE the clock runs
    from t=0, not from the suppressed t=3s (ActionManager.cpp:96-110
    only updates the map on an actual fire)."""
    pdf, turns = _turns(
        spark,
        [
            ("ping a", "2024-03-01 00:00:00"),
            ("ping b", "2024-03-01 00:00:03"),
            ("ping c", "2024-03-01 00:00:06"),
        ],
    )
    got = apply_cooldown(match_turns(turns, RULES), RULES).toPandas()
    assert sorted(got["turn_idx"].tolist()) == [0, 2]
    exp = oracle_matches(pdf, RULES)
    assert sorted(exp["turn_idx"].tolist()) == [0, 2]


def test_cooldown_keyed_per_conversation(spark):
    """Simultaneous fires in different conversations don't suppress
    each other (key = (conv_id, rule_id))."""
    pdf_a, _ = _turns(spark, [("ping", "2024-03-01 00:00:00")], conv="a")
    pdf_b, _ = _turns(spark, [("ping", "2024-03-01 00:00:01")], conv="b")
    pdf = pd.concat([pdf_a, pdf_b], ignore_index=True)
    turns = transcripts_df(spark, pdf)
    got = apply_cooldown(match_turns(turns, RULES), RULES).toPandas()
    assert len(got) == 2


def test_zero_cooldown_is_off(spark):
    rules = [Rule("ping", 0, "ping", cooldown_ms=0,
                  steps=(RuleStep(0, "command", "ack"),))]
    _, turns = _turns(
        spark,
        [("ping", "2024-03-01 00:00:00"), ("ping", "2024-03-01 00:00:00.001")],
    )
    got = apply_cooldown(match_turns(turns, rules), rules).toPandas()
    assert len(got) == 2


def test_suppress_group_state_carry():
    """The shared scan function carries state across calls -- the
    contract the streaming path relies on."""
    g1 = pd.DataFrame({"ts": pd.to_datetime(["2024-03-01 00:00:00"]),
                       "turn_idx": [0]})
    g2 = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-03-01 00:00:03", "2024-03-01 00:00:06"]),
            "turn_idx": [1, 2],
        }
    )
    kept1, last1 = suppress_group(g1, 5000)
    assert len(kept1) == 1 and last1 is not None
    kept2, last2 = suppress_group(g2, 5000, last_fire_ns=last1)
    assert kept2["turn_idx"].tolist() == [2]
    assert last2 == int(pd.Timestamp("2024-03-01 00:00:06").value)


def test_suppress_group_tz_aware_is_epoch_based():
    """tz-aware frames must normalize to UTC EPOCH ns, not wall time:
    the streaming backends seed last_fire_ns from JVM unix_micros (UTC
    epoch), so a non-UTC tz-aware frame dropped to wall time would skew
    every cross-batch cooldown by the tz offset (round-4 advice)."""
    base = pd.Timestamp("2024-03-01 00:00:00", tz="UTC")
    # same instants rendered in a +05:00 zone
    g = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [base + pd.Timedelta(seconds=s) for s in (0, 3, 6)]
            ).tz_convert("Asia/Karachi"),
            "turn_idx": [0, 1, 2],
        }
    )
    # seed: a fire at base-4s in epoch ns -> +0s is inside the 5 s
    # cooldown (gap 4s), +3s fires (gap 7s), +6s is suppressed (gap
    # 3s). A wall-time skew (+05:00 -> every ts 5h past the seed)
    # would instead fire turn 0 -- which this pins against.
    seed = int((base - pd.Timedelta(seconds=4)).value)
    kept, last = suppress_group(g, 5000, last_fire_ns=seed)
    assert kept["turn_idx"].tolist() == [1]
    assert last == int((base + pd.Timedelta(seconds=3)).value)
