"""Temp-table registry + cleanup (end-of-run GC).

Reference: ``sql/operators/cleanup.py:55-301`` waits for DAG tasks, then
drops every ``TempTable`` produced by upstream operators.  In Spark, temp
VIEWS die with the session automatically, so cleanup only matters for
materialized scratch tables; we keep a session-scoped registry so the op
has the same observable behavior (and so `cleanup()` can be called
mid-session, as in the reference's example DAGs).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..table import Table

_REGISTRY_KEY = "_astro_spark_temp_tables"
_registries: dict[str, dict[str, Table]] = {}


def temp_registry(spark: SparkSession) -> dict[str, Table]:
    key = str(id(spark))
    return _registries.setdefault(key, {})


def register_temp_table(spark: SparkSession, table: Table) -> None:
    temp_registry(spark)[table.name] = table


def cleanup(spark: SparkSession, tables: list[Table] | None = None) -> list[str]:
    """Drop temp tables/views; returns the names dropped.

    ``tables=None`` drops everything in the registry (reference default:
    scan all task outputs, cleanup.py:102-119).
    """
    registry = temp_registry(spark)
    targets = tables if tables is not None else list(registry.values())
    dropped = []
    for t in targets:
        if not t.temp:
            continue
        spark.catalog.dropTempView(t.name)
        if spark.catalog.tableExists(t.name):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        registry.pop(t.name, None)
        dropped.append(t.name)
    return dropped
