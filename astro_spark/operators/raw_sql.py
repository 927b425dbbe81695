"""run_raw_sql / get_value_list.

Reference: ``sql/operators/raw_sql.py:25-235`` — execute arbitrary SQL
(DDL/DML/SELECT), optional ``handler`` post-processing, ``results_format``
∈ {list, pandas_dataframe}, ``fail_on_empty``, and a response-size cap;
``get_value_list`` at ``sql/__init__.py:53-79`` feeds Airflow dynamic task
mapping from query results.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from ..plans.identifiers import render_sql


def run_raw_sql(
    spark: SparkSession,
    sql: str,
    parameters: dict[str, Any] | None = None,
    handler: Callable[[DataFrame], Any] | None = None,
    results_format: str | None = None,  # None | "list" | "pandas_dataframe" | "dataframe"
    fail_on_empty: bool = False,
    response_size: int = -1,
) -> Any:
    rendered = render_sql(sql, parameters or {})
    df = spark.sql(rendered)

    if fail_on_empty and df.isEmpty():
        raise ValueError("run_raw_sql(fail_on_empty=True): query returned no rows")

    if handler is not None:
        return handler(df)
    if results_format == "list":
        limited = df.limit(response_size) if response_size >= 0 else df
        return limited.collect()
    if results_format == "pandas_dataframe":
        limited = df.limit(response_size) if response_size >= 0 else df
        return limited.toPandas()
    if results_format == "dataframe":
        return df
    return None  # reference returns None for plain DDL/DML execution


def get_value_list(spark: SparkSession, sql: str, max_length: int = 1000) -> list:
    """Bounded collect for dynamic fan-out (reference sql/__init__.py:53-79)."""
    return spark.sql(sql).limit(max_length).collect()
