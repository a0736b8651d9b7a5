"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the mmt-metrics scalar bundle
over the synthetic book) at sf0.001. ``queries()`` / ``oracle_sql()``
expose every implemented operator from SURVEY.md §2 plus the
data-pipeline tier; the driver compares each against its DuckDB oracle at
sf0.01 (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    return REGISTRY["book_row_metrics"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    return {name: qd.spark for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted keys get
    a rows-only check)."""
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
