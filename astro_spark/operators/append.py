"""append: INSERT INTO target SELECT ... FROM source.

Reference: ``sql/operators/append.py:15-177``; generic SQL built at
``databases/base.py:666-696``.  ``columns`` may be a list/tuple (same
names both sides) or a dict {source_col: target_col}; empty means "all
columns of source".

Spark notes: ``insertInto`` is position-based, so we align by NAME first
(unionByName semantics — SURVEY §7 schema-on-append-drift risk) and cast
to the target's column types (the reference gets implicit coercion from
the warehouse; Spark parquet appends must match types).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..exceptions import NonExistentTableError
from ..table import Table


def normalize_columns(columns) -> dict[str, str]:
    """list/tuple/dict → {source: target} (reference test contract,
    tests/sql/operators/test_merge.py:16-54 applies the same rule)."""
    if not columns:
        return {}
    if isinstance(columns, dict):
        return dict(columns)
    if isinstance(columns, (list, tuple)):
        return {c: c for c in columns}
    raise ValueError(
        f"columns is not a valid type. Valid types: [tuple, list, dict], but got {type(columns)}"
    )


def append(
    spark: SparkSession,
    source_table: Table,
    target_table: Table,
    columns=None,
) -> Table:
    if not spark.catalog.tableExists(target_table.qualified_name):
        raise NonExistentTableError(
            f"append target {target_table.qualified_name} does not exist"
        )
    col_map = normalize_columns(columns)
    source = spark.table(source_table.qualified_name)
    target_schema = spark.table(target_table.qualified_name).schema

    if col_map:
        source = source.select(
            *[F.col(src).alias(tgt) for src, tgt in col_map.items()]
        )

    # align by name against target schema; missing columns → NULL
    aligned = source.select(
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in source.columns
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in target_schema.fields
        ]
    )
    aligned.write.mode("append").format("parquet").saveAsTable(
        target_table.qualified_name
    )
    return target_table
