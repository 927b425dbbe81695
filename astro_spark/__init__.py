"""astro_spark — a PySpark-native rebuild of the Astro SDK's ELT surface.

Public API parity with ``python-sdk/src/astro/sql/__init__.py:20-50`` in
the reference (load_file, transform, transform_file, run_raw_sql,
dataframe, append, merge, drop_table, cleanup, export_to_file,
check_column, check_table, get_value_list, get_file_list) — executed by
one engine: Spark SQL + DataFrames.

Beyond-reference additions (``astro_spark.functions``): deduplication
(exact / minhash-LSH / simhash / n-gram jaccard), embedding similarity
search, text analysis — the LLM-training-data pipeline layer.
"""

from .exceptions import (
    AstroSparkError,
    FileExistsConflictError,
    IllegalIdentifierError,
    MergeConflictError,
    NonExistentTableError,
)
from .file import File, FileType
from .operators import (
    append,
    apply_changes,
    expire_applied_seq,
    check_column,
    profile_table,
    table_checksum,
    columns_exist,
    analyze_table,
    auto_compact,
    compact_table,
    recover_table,
    vacuum_table,
    create_schema_if_not_exists,
    create_table,
    export_table_to_pandas,
    fetch_all_rows,
    row_count,
    schema_exists,
    table_exists,
    check_table,
    cleanup,
    dataframe,
    drop_table,
    export_file,
    export_table_to_file,
    export_to_file,
    get_file_list,
    get_value_list,
    load_file,
    merge,
    merge_from_sql,
    scd2_merge,
    run_raw_sql,
    transform,
    transform_file,
    truncate_table,
)
from .operators.dml import delete_rows, update_rows
from .operators.transform import run_transform
from .session import get_session
from .table import Metadata, Table, TempTable

__version__ = "0.1.0"

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
    "update_rows",
]
