"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CEP match pipeline on the sf0.001
tables; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 (plus the training-data-pipeline operators)
with DuckDB oracles where the semantics are ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from logeventprocessor_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: which turns fired
    which rules with what rendered action (match -> extract -> render
    -> step expansion)."""
    return Q.q_cep_match_actions(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.build_queries()


def oracle_sql() -> dict[str, str]:
    # some oracles read repo-local fixture parquet (the canonical
    # transcript corpus; the augmented embeddings) -- make sure the
    # files exist before any SQL referencing them can run
    from logeventprocessor_spark.fixtures import ensure_oracle_fixtures

    ensure_oracle_fixtures()
    return dict(Q.ORACLES)
