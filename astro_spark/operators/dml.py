"""Row-level DML on plain-parquet tables: DELETE and UPDATE.

The reference delegates row-level changes to engines that have them
(Delta ``MERGE``/``DELETE``, ``databases/databricks/delta.py``); plain
parquet has no row-level ops, so these rewrite the table through the
staged-swap pattern (write staging, rename) — readers never observe a
half-applied change.

Scale notes: a rewrite touches every row, which is exactly what
Delta/Iceberg avoid with file-level skipping + row groups; on those
formats swap these bodies for ``DELETE FROM``/``UPDATE`` SQL.  For
partitioned tables, pushing the predicate into a partition filter
confines the rewrite to affected partitions — pass ``partition_by`` at
write time and keep predicates on the partition column where possible.
Condition strings are Spark SQL expressions evaluated against the
table's columns (identifier-guarded callers should prefer Column
objects).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from ..table import Table
from .merge import _swap_table


def _as_table(table: Table | str) -> Table:
    return table if isinstance(table, Table) else Table(str(table), temp=False)


def delete_rows(
    spark: SparkSession, table: Table | str, condition: Column | str
) -> int:
    """Delete rows matching ``condition``; returns the number deleted."""
    t = _as_table(table)
    df = spark.table(t.qualified_name)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    # SQL three-valued logic: a NULL condition matches nothing, so those
    # rows must be KEPT — coalesce before negating
    cond = F.coalesce(cond, F.lit(False))
    n = df.where(cond).count()
    if n == 0:
        return 0
    _swap_table(spark, df.where(~cond), t)
    return n


def update_rows(
    spark: SparkSession,
    table: Table | str,
    set_map: dict[str, Column | str],
    condition: Column | str | None = None,
) -> int:
    """UPDATE ``set_map`` (column → expression) on rows matching
    ``condition`` (all rows when None); returns the number updated."""
    t = _as_table(table)
    df = spark.table(t.qualified_name)
    cond = (
        F.lit(True)
        if condition is None
        else (F.expr(condition) if isinstance(condition, str) else condition)
    )
    n = df.where(cond).count()
    if n == 0:
        return 0
    updated = df.select(
        *[
            F.when(
                cond,
                F.expr(set_map[c]) if isinstance(set_map.get(c), str) else set_map.get(c, F.col(c)),
            ).otherwise(F.col(c)).alias(c)
            if c in set_map
            else F.col(c)
            for c in df.columns
        ]
    )
    _swap_table(spark, updated, t)
    return n
