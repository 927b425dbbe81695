"""export_to_file: table/DataFrame → CSV/JSON/NDJSON/Parquet/XLSX.

Reference: ``sql/operators/export_to_file.py:18-183`` (+ deprecated
aliases export_file / export_table_to_file); engine path
``databases/base.py:753-770``; per-format writers ``files/types/*.py``;
``if_exists`` ∈ {replace, exception} (constants.py:88).

The reference always writes ONE file through a pandas stream
(``files/base.py:117-128``) — see ``sources/writers.py`` for how
single-file parity vs. scalable directory export is handled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..file import File, FileType, infer_filetype
from ..sources.writers import write_dataframe_to_file
from ..table import Table


def export_to_file(
    spark: SparkSession,
    input_data: Table | DataFrame,
    output_file: File | str,
    if_exists: str = "replace",
    single_file: bool | None = None,
    options: dict | None = None,
    partition_by: list[str] | None = None,
    target_file_mb: int | float | None = None,
) -> File:
    if isinstance(output_file, str):
        output_file = File(path=output_file)
    if isinstance(input_data, Table):
        df = spark.table(input_data.qualified_name)
    else:
        df = input_data
    ftype = output_file.filetype or infer_filetype(output_file.path)
    write_dataframe_to_file(
        df,
        output_file.path,
        ftype,
        if_exists=if_exists,
        single_file=single_file,
        options=options,
        partition_by=partition_by,
        target_file_mb=target_file_mb,
    )
    from .. import lineage

    if lineage.is_enabled(spark):
        lineage.emit_export(spark, df, output_file, if_exists)
    return output_file


def export_file(*args, **kwargs) -> File:
    """Deprecated reference alias (``sql/operators/export_file.py``) —
    kept for drop-in parity; delegates to :func:`export_to_file`."""
    import warnings

    warnings.warn(
        "export_file is deprecated; use export_to_file",
        DeprecationWarning,
        stacklevel=2,
    )
    return export_to_file(*args, **kwargs)


def export_table_to_file(*args, **kwargs) -> File:
    """Deprecated reference alias (``sql/operators/export_table_to_file.py``)
    — kept for drop-in parity; delegates to :func:`export_to_file`."""
    import warnings

    warnings.warn(
        "export_table_to_file is deprecated; use export_to_file",
        DeprecationWarning,
        stacklevel=2,
    )
    return export_to_file(*args, **kwargs)
