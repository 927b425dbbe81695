from .append import append
from .catalog import (
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
)
from .cdc import apply_changes, expire_applied_seq
from .checks import check_column, check_table, profile_table, table_checksum
from .cleanup import cleanup, register_temp_table, temp_registry
from .dataframe import dataframe
from .dml import delete_rows, update_rows
from .drop import drop_table, truncate_table
from .export import export_file, export_table_to_file, export_to_file
from .files import get_file_list
from .load_file import load_file
from .merge import merge, merge_from_sql
from .scd import scd2_merge
from .raw_sql import get_value_list, run_raw_sql
from .timetravel import (
    ConcurrentWriteError,
    tt_add_constraint,
    tt_append,
    VersionedTable,
    save_dataframe_versioned,
    tt_create,
    tt_delete_where,
    tt_diff,
    tt_drop_constraint,
    tt_history,
    tt_merge,
    tt_optimize,
    tt_overwrite,
    tt_read,
    tt_restore,
    tt_update_where,
    tt_vacuum,
)
from .transform import transform, transform_file

__all__ = [
    "append",
    "apply_changes",
    "expire_applied_seq",
    "check_column",
    "check_table",
    "table_checksum",
    "cleanup",
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
    "dataframe",
    "delete_rows",
    "drop_table",
    "export_to_file",
    "export_file",
    "export_table_to_file",
    "get_file_list",
    "get_value_list",
    "load_file",
    "merge",
    "merge_from_sql",
    "scd2_merge",
    "profile_table",
    "register_temp_table",
    "run_raw_sql",
    "temp_registry",
    "ConcurrentWriteError",
    "tt_add_constraint",
    "tt_append",
    "VersionedTable",
    "save_dataframe_versioned",
    "tt_create",
    "tt_delete_where",
    "tt_diff",
    "tt_drop_constraint",
    "tt_history",
    "tt_merge",
    "tt_optimize",
    "tt_overwrite",
    "tt_read",
    "tt_restore",
    "tt_update_where",
    "tt_vacuum",
    "transform",
    "transform_file",
    "truncate_table",
    "update_rows",
]
