"""Pure-Python oracle of the reference's match semantics.

This is an INDEPENDENT, deliberately-naive serial implementation of the
reference's data path (ActionManager::processEvent,
/root/reference/LogEventProcessor/ActionManager.cpp:49-120) used only
to generate golden fixtures for pytest. It shares no code with the
Spark operators it checks.

Encoded semantics (each with its reference citation):

* rules iterate in definition (index) order -- ActionManager.cpp:126;
* disabled rules and disabled steps are skipped --
  RegexMatcher.cpp:64-66, ActionManager.cpp:80;
* match = case-insensitive unanchored search -- RegexMatcher.cpp:69,
  :109 (ECMAScript icase regex_search == Python re.search+IGNORECASE
  for the canonical corpus);
* extracted = group(1) if the PATTERN has >=1 group (even if the group
  matched empty / did not participate -> empty string), else the full
  match group(0) -- ActionManager.cpp:72-77;
* rendered value = step value with every '#' replaced by extracted,
  only when extracted is non-empty -- ActionManager.cpp:83-90; for
  'sms'/'email' steps the FULL turn text is forwarded --
  ActionManager.cpp:82, :146, ActionSender.cpp:564-588;
* cooldown: keyed by (conv_id, rule_id), in EVENT TIME: a fire is
  suppressed if ts - last_EMITTED_fire_ts < cooldown_ms; suppressed
  fires do NOT reset the clock -- ActionManager.cpp:96-110 (state map
  ActionManager.h:148-150). The reference uses wall-clock on a single
  implicit stream; we define it deterministically in event time per
  conversation (SURVEY.md section 7.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd

from logeventprocessor_spark.rules import Rule


@dataclass(frozen=True)
class OracleRow:
    conv_id: str
    turn_idx: int
    rule_id: str
    rule_idx: int
    step_idx: int
    extracted: str
    action_type: str
    rendered_value: str
    ts: pd.Timestamp
    suppressed_by_cooldown: bool


def extract_value(m: re.Match) -> str:
    """group(1)-else-group(0), with non-participating group -> ''."""
    if m.re.groups >= 1:
        return m.group(1) or ""
    return m.group(0)


def render_value(step_value: str, extracted: str, action_type: str, text: str) -> str:
    if action_type in ("sms", "email"):
        return text
    if extracted:
        return step_value.replace("#", extracted)
    return step_value


def oracle_matches(
    turns: pd.DataFrame,
    rules: list[Rule],
    with_cooldown: bool = True,
    include_suppressed: bool = False,
) -> pd.DataFrame:
    """Golden fixture: one row per (turn, fired rule, enabled step).

    ``turns`` must have columns conv_id, turn_idx, text, ts. Processing
    order inside a conversation is event-time order with turn_idx as
    tiebreak (the engine's deterministic ordering contract).
    """
    compiled = [
        (r, re.compile(r.pattern, re.IGNORECASE)) for r in rules if r.enabled
    ]
    t = turns.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    last_fire: dict[tuple[str, str], pd.Timestamp] = {}
    out: list[OracleRow] = []
    for row in t.itertuples(index=False):
        text = row.text or ""
        for rule, pat in compiled:
            m = pat.search(text)
            if not m:
                continue
            suppressed = False
            if with_cooldown and rule.cooldown_ms > 0:
                key = (row.conv_id, rule.rule_id)
                prev = last_fire.get(key)
                if prev is not None and (
                    (row.ts - prev).total_seconds() * 1000.0 < rule.cooldown_ms
                ):
                    suppressed = True
                else:
                    last_fire[key] = row.ts
            extracted = extract_value(m)
            for step in rule.steps:
                if not step.enabled:
                    continue
                if suppressed and not include_suppressed:
                    continue
                out.append(
                    OracleRow(
                        conv_id=row.conv_id,
                        turn_idx=int(row.turn_idx),
                        rule_id=rule.rule_id,
                        rule_idx=rule.rule_idx,
                        step_idx=step.step_idx,
                        extracted=extracted,
                        action_type=step.type,
                        rendered_value=render_value(
                            step.value, extracted, step.type, text
                        ),
                        ts=row.ts,
                        suppressed_by_cooldown=suppressed,
                    )
                )
    cols = [
        "conv_id",
        "turn_idx",
        "rule_id",
        "rule_idx",
        "step_idx",
        "extracted",
        "action_type",
        "rendered_value",
        "ts",
        "suppressed_by_cooldown",
    ]
    pdf = pd.DataFrame([r.__dict__ for r in out], columns=cols)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["rule_idx"] = pdf["rule_idx"].astype("int32")
    pdf["step_idx"] = pdf["step_idx"].astype("int32")
    return pdf.sort_values(
        ["conv_id", "turn_idx", "rule_idx", "step_idx"], kind="mergesort"
    ).reset_index(drop=True)


def oracle_sequence_pairs(
    matches: pd.DataFrame, rule_a: str, rule_b: str, within_ms: int
) -> pd.DataFrame:
    """Batch oracle for A-then-B sequence detection (the reference's
    chained-matcher generalization, SURVEY.md 2.5 T3): for each fire of
    rule B, the LATEST fire of rule A in the same conversation with
    0 <= ts_b - ts_a <= within_ms.
    """
    out = []
    a = matches[matches.rule_id == rule_a].drop_duplicates(["conv_id", "turn_idx"])
    b = matches[matches.rule_id == rule_b].drop_duplicates(["conv_id", "turn_idx"])
    for conv, bg in b.groupby("conv_id"):
        ag = a[a.conv_id == conv]
        if ag.empty:
            continue
        for brow in bg.itertuples(index=False):
            cand = ag[
                (ag.ts <= brow.ts)
                & ((brow.ts - ag.ts).dt.total_seconds() * 1000.0 <= within_ms)
            ]
            if cand.empty:
                continue
            arow = cand.sort_values(["ts", "turn_idx"]).iloc[-1]
            out.append(
                (
                    conv,
                    int(arow.turn_idx),
                    int(brow.turn_idx),
                    arow.ts,
                    brow.ts,
                )
            )
    pdf = pd.DataFrame(
        out, columns=["conv_id", "a_turn_idx", "b_turn_idx", "a_ts", "b_ts"]
    )
    return pdf.sort_values(["conv_id", "b_turn_idx"]).reset_index(drop=True)
