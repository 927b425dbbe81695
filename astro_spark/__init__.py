"""astro_spark — a PySpark-native rebuild of the Astro SDK's ELT surface.

Public API parity with ``python-sdk/src/astro/sql/__init__.py:20-50`` in
the reference (load_file, transform, transform_file, run_raw_sql,
dataframe, append, merge, drop_table, cleanup, export_to_file,
check_column, check_table, get_value_list, get_file_list) — executed by
one engine: Spark SQL + DataFrames.

Beyond-reference additions (``astro_spark.functions``): deduplication
(exact / minhash-LSH / simhash / n-gram jaccard), embedding similarity
search, text analysis — the LLM-training-data pipeline layer.

The operator surface is imported LAZILY (PEP 562): every Spark 4 Python
DataSource plan/commit spawns a fresh Python worker that unpickles
classes from ``astro_spark.sources.tt_datasource``, and unpickling
imports this package root.  An eager root pulled in the whole operator
layer (and through it pandas) at ~0.7 s per worker spawn — pure tax on
every ``versioned_parquet`` read, write and stream micro-batch
(profiled r14: two batch format-writes paid ~1.1 s of it each).  Lazy
exports keep the worker's import down to the sources module itself
while ``from astro_spark import load_file`` etc. behave exactly as
before.
"""

from __future__ import annotations

from .exceptions import (
    AstroSparkError,
    FileExistsConflictError,
    IllegalIdentifierError,
    MergeConflictError,
    NonExistentTableError,
)
from .file import File, FileType
from .session import get_session
from .table import Metadata, Table, TempTable

__version__ = "0.1.0"

_OPERATOR_EXPORTS = {
    "append",
    "apply_changes",
    "expire_applied_seq",
    "check_column",
    "profile_table",
    "table_checksum",
    "columns_exist",
    "analyze_table",
    "auto_compact",
    "compact_table",
    "recover_table",
    "vacuum_table",
    "create_schema_if_not_exists",
    "create_table",
    "export_table_to_pandas",
    "fetch_all_rows",
    "row_count",
    "schema_exists",
    "table_exists",
    "check_table",
    "cleanup",
    "dataframe",
    "drop_table",
    "export_file",
    "export_table_to_file",
    "export_to_file",
    "get_file_list",
    "get_value_list",
    "load_file",
    "merge",
    "merge_from_sql",
    "scd2_merge",
    "run_raw_sql",
    "transform",
    "transform_file",
    "truncate_table",
    "tt_add_columns",
    "tt_add_constraint",
    "tt_append",
    "VersionedTable",
    "save_dataframe_versioned",
    "tt_changes",
    "tt_changes_drain",
    "tt_clone",
    "tt_convert",
    "tt_create",
    "tt_delete_where",
    "tt_detail",
    "tt_diff",
    "tt_drop_constraint",
    "tt_history",
    "tt_merge",
    "tt_optimize",
    "tt_overwrite",
    "tt_read",
    "tt_register",
    "tt_registered",
    "tt_resolve_name",
    "tt_properties",
    "tt_restore",
    "tt_restore_to_ts",
    "tt_set_properties",
    "tt_unregister",
    "tt_unset_properties",
    "tt_update_where",
    "tt_vacuum",
}

_DML_EXPORTS = {"delete_rows", "update_rows"}
_TRANSFORM_EXPORTS = {"run_transform"}


def __getattr__(name: str):
    import importlib

    if name in _OPERATOR_EXPORTS:
        mod = importlib.import_module(".operators", __name__)
        value = getattr(mod, name)
    elif name in _DML_EXPORTS:
        mod = importlib.import_module(".operators.dml", __name__)
        value = getattr(mod, name)
    elif name in _TRANSFORM_EXPORTS:
        mod = importlib.import_module(".operators.transform", __name__)
        value = getattr(mod, name)
    elif name in ("lineage", "operators", "functions", "streaming", "sources"):
        value = importlib.import_module("." + name, __name__)
    else:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    globals()[name] = value
    return value


__all__ = [
    "AstroSparkError",
    "File",
    "FileType",
    "FileExistsConflictError",
    "IllegalIdentifierError",
    "MergeConflictError",
    "Metadata",
    "NonExistentTableError",
    "Table",
    "TempTable",
    "append",
    "apply_changes",
    "expire_applied_seq",
    "check_column",
    "table_checksum",
    "check_table",
    "cleanup",
    "columns_exist",
    "analyze_table",
    "auto_compact",
    "compact_table",
    "recover_table",
    "vacuum_table",
    "create_schema_if_not_exists",
    "create_table",
    "dataframe",
    "delete_rows",
    "drop_table",
    "export_table_to_pandas",
    "fetch_all_rows",
    "row_count",
    "schema_exists",
    "table_exists",
    "export_to_file",
    "export_file",
    "export_table_to_file",
    "get_file_list",
    "get_session",
    "get_value_list",
    "load_file",
    "merge",
    "merge_from_sql",
    "scd2_merge",
    "profile_table",
    "run_raw_sql",
    "run_transform",
    "transform",
    "transform_file",
    "truncate_table",
    "tt_add_columns",
    "tt_add_constraint",
    "tt_append",
    "VersionedTable",
    "save_dataframe_versioned",
    "tt_changes",
    "tt_changes_drain",
    "tt_clone",
    "tt_convert",
    "tt_create",
    "tt_delete_where",
    "tt_detail",
    "tt_diff",
    "tt_drop_constraint",
    "tt_history",
    "tt_merge",
    "tt_optimize",
    "tt_overwrite",
    "tt_read",
    "tt_register",
    "tt_registered",
    "tt_resolve_name",
    "tt_properties",
    "tt_restore",
    "tt_restore_to_ts",
    "tt_set_properties",
    "tt_unregister",
    "tt_unset_properties",
    "tt_update_where",
    "tt_vacuum",
]
