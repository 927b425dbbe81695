"""dataframe: run user Python over tables.

Reference: ``sql/operators/dataframe.py:99-343`` — Table args annotated
``pd.DataFrame`` are exported *entirely* into pandas on the worker (the
scalability cliff called out in SURVEY §3.3), the user callable runs, and
an optional ``output_table`` gets the result written back.

Spark rebuild: by default the user function receives **Spark** DataFrames
(lazy plans — nothing materializes, 100 TB safe).  Args annotated
``pd.DataFrame`` keep reference compat via Arrow-accelerated
``toPandas()``.  Returned pandas frames are re-parallelized with
``spark.createDataFrame``.  ``columns_names_capitalization`` applies to
the result, as in the reference (dataframe.py:174-177, 197-219).
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..table import Table
from .load_file import save_dataframe_as_table


def _is_pandas_annotation(annotation: Any) -> bool:
    """Handle both live types and PEP-563 string annotations."""
    if annotation is pd.DataFrame:
        return True
    return isinstance(annotation, str) and annotation.replace(" ", "") in (
        "pd.DataFrame",
        "pandas.DataFrame",
        "pandas.core.frame.DataFrame",
    )


def _resolve_arg(spark: SparkSession, value: Any, annotation: Any) -> Any:
    if isinstance(value, Table):
        sdf = spark.table(value.qualified_name)
        if _is_pandas_annotation(annotation):
            return sdf.toPandas()
        return sdf
    return value


def _apply_capitalization(df: DataFrame, mode: str) -> DataFrame:
    if mode == "lower":
        return df.toDF(*[c.lower() for c in df.columns])
    if mode == "upper":
        return df.toDF(*[c.upper() for c in df.columns])
    return df


def dataframe(
    func: Callable | None = None,
    *,
    columns_names_capitalization: str = "original",
) -> Callable:
    """Decorator parity with ``@aql.dataframe``.

        @dataframe
        def enrich(orders: DataFrame, rate: float) -> DataFrame:
            return orders.withColumn("taxed", orders.o_totalprice * rate)

        out = enrich(spark, orders_table, 1.2, output_table=Table("taxed"))

    Returns the result Table when ``output_table`` is given, else the
    (Spark or pandas) result object itself.
    """

    def _decorate(fn: Callable) -> Callable:
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def _wrapper(
            spark: SparkSession,
            *args: Any,
            output_table: Table | None = None,
            **kwargs: Any,
        ) -> Any:
            bound = sig.bind(*args, **kwargs)
            bound.apply_defaults()
            resolved = {}
            for name, value in bound.arguments.items():
                ann = sig.parameters[name].annotation
                resolved[name] = _resolve_arg(spark, value, ann)
            result = fn(**resolved)

            if isinstance(result, pd.DataFrame):
                result.columns = [
                    c.lower() if columns_names_capitalization == "lower"
                    else c.upper() if columns_names_capitalization == "upper"
                    else c
                    for c in result.columns
                ]
                if output_table is not None:
                    sdf = spark.createDataFrame(result)
                    save_dataframe_as_table(sdf, output_table, if_exists="replace")
                    return output_table
                return result  # pandas in, pandas out (reference parity)
            if isinstance(result, DataFrame):
                result = _apply_capitalization(result, columns_names_capitalization)
                if output_table is not None:
                    save_dataframe_as_table(result, output_table, if_exists="replace")
                    return output_table
            return result

        _wrapper.__astro_op__ = "dataframe"
        return _wrapper

    return _decorate(func) if func is not None else _decorate
