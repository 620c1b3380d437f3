"""Per-rule cooldown suppression -- the keyed-state CEP operator.

Reference semantics (/root/reference/LogEventProcessor/
ActionManager.cpp:96-110, state map ActionManager.h:148-150): if a rule
fired less than ``cooldown_ms`` ago, suppress this fire; suppressed
fires do NOT advance the clock (the map is only updated when the rule
actually fires). The reference keys this by rule on its single implicit
stream; we key by ``(conv_id, rule_id)`` and define "ago" in EVENT TIME
(deterministic; see SURVEY.md 7.4).

Batch form: ``applyInPandas`` per key group -- a sequential greedy scan
per (conv_id, rule_id), which is tiny per group and embarrassingly
parallel across groups. Matches with cooldown_ms == 0 BYPASS the
shuffle entirely (they need no state), so at 100 TB the shuffle volume
is only the cooldown-bearing rule hits, not the whole match stream.

Streaming form lives in streaming/pipeline.py
(``applyInPandasWithState``) and shares ``suppress_group`` below so the
two paths cannot diverge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def apply_cooldown(matches: DataFrame, rules: list[Rule]) -> DataFrame:
    """matches (MATCHES_SCHEMA) -> matches with cooldown-suppressed
    fires removed. Zero-cooldown rules pass through shuffle-free."""
    cooldowns = {r.rule_id: r.cooldown_ms for r in rules if r.cooldown_ms > 0}
    if not cooldowns:
        return matches

    hot = matches.filter(F.col("rule_id").isin(list(cooldowns.keys())))
    cold = matches.filter(~F.col("rule_id").isin(list(cooldowns.keys())))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return g
        cd = cooldowns[g["rule_id"].iloc[0]]
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        kept, _ = suppress_group(g, cd)
        return kept

    survived = hot.groupBy("conv_id", "rule_id").applyInPandas(
        fn, schema=MATCHES_SCHEMA
    )
    return cold.unionByName(survived)
