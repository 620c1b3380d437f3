"""Per-rule cooldown suppression -- the keyed-state CEP operator.

Reference semantics (/root/reference/LogEventProcessor/
ActionManager.cpp:96-110, state map ActionManager.h:148-150): if a rule
fired less than ``cooldown_ms`` ago, suppress this fire; suppressed
fires do NOT advance the clock (the map is only updated when the rule
actually fires). The reference keys this by rule on its single implicit
stream; we key by ``(conv_id, rule_id)`` and define "ago" in EVENT TIME
(deterministic; see SURVEY.md 7.4).

Batch realization is SINGLE-PASS and SINGLE-SHUFFLE, designed for the
100 TB case where the match stream is far smaller than the turn stream
but still too large to scan twice:

    matches -> repartition(conv_id, rule_id)
            -> sortWithinPartitions(conv_id, rule_id, ts, turn_idx)
            -> mapInPandas(group-aware greedy scan)

``mapInPandas`` (not ``applyInPandas``) avoids one Python call per
(conv, rule) group -- a partition's many groups are processed in one
Arrow batch with a vectorized pandas groupby; rows of zero-cooldown
rules pass straight through inside the same batch. Because Arrow may
split a partition into multiple record batches, the trailing group of
each chunk is carried into the next chunk so no keyed scan is ever cut
mid-group.

The streaming form (streaming/pipeline.py) keys real state by
(conv_id, rule_id) via ``applyInPandasWithState`` and shares
``suppress_group`` below so the two paths cannot diverge.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from logeventprocessor_spark.rules import Rule
from logeventprocessor_spark.schema import MATCHES_SCHEMA


def suppress_group(
    g: pd.DataFrame, cooldown_ms: int, last_fire_ns: int | None = None
) -> tuple[pd.DataFrame, int | None]:
    """Greedy event-time cooldown scan over ONE (conv_id, rule_id) group.

    ``g`` must be sorted by (ts, turn_idx). Returns (kept rows,
    new last-fire time in ns) so the streaming path can persist state
    across micro-batches.
    """
    ts_ns = g["ts"].astype("int64").to_numpy()
    keep = [False] * len(g)
    cd_ns = int(cooldown_ms) * 1_000_000
    last = last_fire_ns
    for i in range(len(g)):
        if last is None or ts_ns[i] - last >= cd_ns:
            keep[i] = True
            last = int(ts_ns[i])
    return g[pd.Series(keep, index=g.index)], last


def _cooldown_chunk(pdf: pd.DataFrame, cooldowns: dict[str, int]) -> pd.DataFrame:
    """Apply the greedy scan to every hot group in a sorted chunk;
    zero-cooldown rows pass through untouched."""
    hot_mask = pdf["rule_id"].isin(cooldowns).to_numpy()
    if not hot_mask.any():
        return pdf
    cold = pdf[~hot_mask]
    kept = [cold] if len(cold) else []
    for (_, rule_id), g in pdf[hot_mask].groupby(
        ["conv_id", "rule_id"], sort=False
    ):
        kept.append(suppress_group(g, cooldowns[rule_id])[0])
    return pd.concat(kept, ignore_index=False) if kept else pdf.iloc[0:0]


def apply_cooldown(
    matches: DataFrame, rules: list[Rule], num_partitions: int | None = None
) -> DataFrame:
    """matches (MATCHES_SCHEMA) -> matches with cooldown-suppressed
    fires removed. No-op (no shuffle at all) when no rule has a
    cooldown."""
    cooldowns = {r.rule_id: r.cooldown_ms for r in rules if r.cooldown_ms > 0}
    if not cooldowns:
        return matches

    rep = (
        matches.repartition(num_partitions, "conv_id", "rule_id")
        if num_partitions
        else matches.repartition("conv_id", "rule_id")
    ).sortWithinPartitions("conv_id", "rule_id", "ts", "turn_idx")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            # hold back the trailing (conv_id, rule_id) group: Arrow may
            # have split this partition mid-group
            last = pdf.iloc[-1]
            tail = (pdf["conv_id"].to_numpy() == last["conv_id"]) & (
                pdf["rule_id"].to_numpy() == last["rule_id"]
            )
            carry = pdf[tail]
            head = pdf[~tail]
            if len(head):
                yield _cooldown_chunk(head, cooldowns)
        if carry is not None and len(carry):
            yield _cooldown_chunk(carry, cooldowns)

    return rep.mapInPandas(fn, schema=MATCHES_SCHEMA)
