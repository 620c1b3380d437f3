"""Plan-quality guards: scale killers must never reappear in a
registered query's physical plan (SURVEY.md 7.1; round-1 verdict
flagged a cartesian product that had been registered by mistake)."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# the O(n^2) exact baseline is the single documented exception
ALLOWED_CARTESIAN = {"embedding_brute_force_pairs"}


def test_no_cartesian_products_in_registered_plans(spark):
    qs = entrymod.queries()
    offenders = []
    for name, fn in qs.items():
        if name in ALLOWED_CARTESIAN:
            continue
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian plans registered: {offenders}"


def test_entry_contract(spark):
    """Driver smoke replica: entry() runs, yields >=0 rows, and keeps
    the stable flagship schema."""
    df = entrymod.entry(spark)
    assert df.columns == [
        "conv_id", "turn_idx", "rule_id", "rule_idx", "step_idx",
        "extracted", "action_type", "rendered_value",
    ]
    assert df.count() >= 0


def test_every_query_has_oracle_or_documented_exception():
    """Every registered query is either DuckDB-oracled or one of the
    two documented rows-only cases (xxhash64 signatures / binary
    decode are not SQL-expressible)."""
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = {name for name in qs if name not in oracles}
    assert rows_only == {"simhash_pairs", "multimodal_features"}
