"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the engine's flagship job — the full constraint-validation
suite over the sf0.001 lineitem table — and returns the verdict DataFrame.
``queries`` / ``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline ops (dedup, ANN, text analysis),
each mapped onto the driver's testdata with a DuckDB-checkable oracle where
SQL can express it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: constraint-suite verdicts over sf0.001 lineitem."""
    from engine import queries as q

    return q.suite_verdicts_lineitem(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from engine import queries as q

    return dict(q.Q)


def oracle_sql() -> dict[str, str]:
    from engine import queries as q

    return dict(q.ORACLE)
