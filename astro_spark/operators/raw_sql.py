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


class QueryModifier:
    """Pre/post statements around the main query.

    Reference: ``astro/query_modifier.py:6-29`` — e.g. Snowflake session
    tags.  In Spark these are typically ``SET`` conf statements or DDL.
    """

    def __init__(self, pre_queries: list[str] | None = None, post_queries: list[str] | None = None):
        self.pre_queries = pre_queries or []
        self.post_queries = post_queries or []


_DESCRIBE_HISTORY_RE = None
_RESTORE_RE = None


def _route_timetravel_sql(spark: SparkSession, stmt: str) -> DataFrame | None:
    """Route the two Delta SQL maintenance shapes a reference user
    issues against a versioned-parquet root through the timetravel
    operators (the ``merge_from_sql`` precedent for SQL-text parity)::

        DESCRIBE HISTORY '<root>'
        RESTORE TABLE '<root>' TO VERSION AS OF <n>

    The quoted path form targets this engine's versioned roots; bare
    table identifiers fall through to ``spark.sql`` untouched (a real
    Delta catalog handles them).  Returns the result DataFrame
    (history rows; the restore's (version,) row) or None when the
    statement is neither shape."""
    global _DESCRIBE_HISTORY_RE, _RESTORE_RE
    import re

    if _DESCRIBE_HISTORY_RE is None:
        _DESCRIBE_HISTORY_RE = re.compile(
            r"(?is)^\s*describe\s+history\s+'([^']+)'\s*;?\s*$"
        )
        _RESTORE_RE = re.compile(
            r"(?is)^\s*restore\s+table\s+'([^']+)'\s+to\s+version\s+as\s+of"
            r"\s+(\d+)\s*;?\s*$"
        )
    m = _DESCRIBE_HISTORY_RE.match(stmt)
    if m:
        from .timetravel import tt_history

        return tt_history(spark, m.group(1))
    m = _RESTORE_RE.match(stmt)
    if m:
        from .timetravel import tt_restore

        v = tt_restore(spark, m.group(1), int(m.group(2)))
        return spark.createDataFrame([(v,)], "restored_as_version long")
    return None


def run_raw_sql(
    spark: SparkSession,
    sql: str,
    parameters: dict[str, Any] | None = None,
    handler: Callable[[DataFrame], Any] | None = None,
    results_format: str | None = None,  # None | "list" | "pandas_dataframe" | "dataframe"
    fail_on_empty: bool = False,
    response_size: int = -1,
    query_modifier: QueryModifier | None = None,
) -> Any:
    if query_modifier:
        for q in query_modifier.pre_queries:
            spark.sql(q)
    rendered = render_sql(sql, parameters or {})

    def _finish(result: Any) -> Any:
        # post-queries run AFTER the result is materialized (Spark plans
        # are lazy; the reference's engines execute eagerly)
        if query_modifier:
            for q in query_modifier.post_queries:
                spark.sql(q)
        return result

    if rendered.lstrip()[:10].lower().startswith("merge into"):
        # Spark rejects MERGE INTO on v1 parquet tables; route the
        # reference's generated Delta MERGE text through the engine's
        # copy-on-write merge (same semantics, crash-recoverable).  MERGE
        # text outside merge_from_sql's grammar (literal VALUES sources,
        # WHEN MATCHED THEN DELETE, conditional clauses) falls back to
        # spark.sql so a session whose catalog CAN execute it (Delta /
        # Iceberg v2) still does; on plain parquet that surfaces Spark's
        # own UNSUPPORTED_FEATURE error rather than ours.
        from ..exceptions import IllegalIdentifierError
        from .merge import MergeSqlGrammarError, merge_from_sql

        try:
            merge_from_sql(spark, rendered)
        except (MergeSqlGrammarError, IllegalIdentifierError):
            # only the dedicated PARSE-phase rejections fall back —
            # nothing ran yet.  An execution-time ValueError propagates
            # (re-running a partially-applied MERGE would double-apply).
            spark.sql(rendered)
        # results_format / fail_on_empty are no-ops for MERGE (it returns
        # no rows); post_queries still run via _finish, symmetric with
        # every other statement type.
        if handler is not None:
            return _finish(handler(spark.createDataFrame([], "ok boolean")))
        return _finish(None)

    tt = _route_timetravel_sql(spark, rendered)
    if tt is not None:
        df = tt
    else:
        df = spark.sql(rendered)

    if fail_on_empty and df.isEmpty():
        raise ValueError("run_raw_sql(fail_on_empty=True): query returned no rows")

    if handler is not None:
        return _finish(handler(df))
    if results_format == "list":
        limited = df.limit(response_size) if response_size >= 0 else df
        return _finish(limited.collect())
    if results_format == "pandas_dataframe":
        limited = df.limit(response_size) if response_size >= 0 else df
        return _finish(limited.toPandas())
    if results_format == "dataframe":
        # caller gets the lazy plan; post-queries still run now — avoid
        # post-queries that invalidate the plan's inputs in this mode
        return _finish(df)
    return _finish(None)  # reference returns None for plain DDL/DML


def get_value_list(spark: SparkSession, sql: str, max_length: int = 1000) -> list:
    """Bounded collect for dynamic fan-out (reference sql/__init__.py:53-79)."""
    return spark.sql(sql).limit(max_length).collect()
