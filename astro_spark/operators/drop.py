"""drop_table / truncate_table.

Reference: ``sql/operators/drop.py:14-51`` (template at
``databases/base.py:57,383-390``); truncate at ``snowflake.py:1098-1100``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..table import Table


def drop_table(spark: SparkSession, table: Table) -> None:
    if table.temp:
        spark.catalog.dropTempView(table.name)
    spark.sql(f"DROP TABLE IF EXISTS {table.qualified_name}")


def truncate_table(spark: SparkSession, table: Table) -> None:
    """Overwrite-with-empty preserves schema; avoids reading the table it
    rewrites by materializing the schema first (TRUNCATE TABLE is only
    supported for partitioned/catalog-specific cases in Spark)."""
    name = table.qualified_name
    schema = spark.table(name).schema
    empty = spark.createDataFrame([], schema)
    empty.write.mode("overwrite").format("parquet").saveAsTable(name)
