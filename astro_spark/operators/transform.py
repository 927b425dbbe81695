"""transform / transform_file: SQL SELECT → materialized table (CTAS).

Reference lifecycle (``sql/operators/transform.py:20-191`` +
``base_decorator.py:25-417``, traced in SURVEY §3.1):
  1. resolve args; Table args become safe identifiers, scalars become
     bound params ({{placeholder}} substitution)
  2. drop output table, then CTAS the SELECT into it
  3. return the Table handle

Spark rebuild: Table params are registered as temp views (temp tables) or
already live in the catalog (permanent), placeholders are substituted with
validated identifiers, and the SELECT is materialized with
``df.write.saveAsTable`` — one engine, one session, Catalyst optimizes the
whole SELECT (pushdown/pruning/join planning), which the reference
delegates to each warehouse.

Both a functional form and a decorator form are provided; the decorator
mirrors the reference's ``@aql.transform`` user experience.
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from ..plans.identifiers import render_sql
from ..table import Table, TempTable
from .drop import drop_table
from .load_file import save_dataframe_as_table


def run_transform(
    spark: SparkSession,
    sql: str,
    parameters: dict[str, Any] | None = None,
    output_table: Table | None = None,
) -> Table:
    """Render {{placeholders}}, execute the SELECT, materialize as a table."""
    rendered = render_sql(sql, parameters or {})
    df = spark.sql(rendered)
    from .timetravel import VersionedTable, save_dataframe_versioned

    if isinstance(output_table, VersionedTable):
        # CTAS into a versioned root (the reference's CTAS USING DELTA,
        # delta.py:168-187): 'replace' commits a NEW version — the
        # drop-then-CTAS below is the plain-catalog analog; here history
        # is the point, so nothing is dropped
        save_dataframe_versioned(spark, df, output_table, if_exists="replace")
        from .. import lineage

        if lineage.is_enabled(spark):
            lineage.emit_transform(spark, rendered, output_table)
        return output_table
    out = output_table or TempTable()
    # reference drops the output table before CTAS (transform.py:60-61)
    drop_table(spark, out)
    save_dataframe_as_table(df, out, if_exists="replace")
    from .. import lineage

    if lineage.is_enabled(spark):
        lineage.emit_transform(spark, rendered, out)
    return out


def transform(
    func: Callable[..., str] | None = None,
    *,
    conn_id: str = "",
) -> Callable:
    """Decorator parity with ``@aql.transform``.

    The wrapped function returns a SQL string with ``{{arg}}`` placeholders
    named after its parameters.  Calling the wrapped function executes it:

        @transform
        def top_movies(imdb: Table, limit: int) -> str:
            return "SELECT * FROM {{imdb}} ORDER BY rating DESC LIMIT {{limit}}"

        out = top_movies(spark, imdb_table, 5, output_table=Table("top5"))
    """

    def _decorate(fn: Callable[..., str]) -> Callable:
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def _wrapper(spark: SparkSession, *args: Any, output_table: Table | None = None, **kwargs: Any) -> Table:
            bound = sig.bind(*args, **kwargs)
            bound.apply_defaults()
            sql = fn(*bound.args, **bound.kwargs)
            return run_transform(spark, sql, dict(bound.arguments), output_table)

        _wrapper.__astro_op__ = "transform"
        return _wrapper

    return _decorate(func) if func is not None else _decorate


def transform_file(
    spark: SparkSession,
    file_path: str,
    parameters: dict[str, Any] | None = None,
    output_table: Table | None = None,
) -> Table:
    """SQL from a .sql file (reference transform.py:145-191; file read at
    base_decorator.py:217-219)."""
    with open(file_path) as fh:
        sql = fh.read()
    return run_transform(spark, sql, parameters, output_table)
