"""merge: upsert source into target on conflict columns.

Reference: ``sql/operators/merge.py:16-200`` with 9 per-engine SQL
dialects (SQLite ``INSERT..ON CONFLICT`` sqlite.py:96-133, Snowflake
``MERGE INTO`` snowflake.py:860-1006, Delta ``MERGE INTO``
databricks/delta.py:357-442, ...).  ``if_conflicts`` ∈
{ignore, update, exception} (constants.py:91).

Spark rebuild (no Delta in this container): MERGE is expressed as a pure
DataFrame plan over the catalog parquet table, then the target is swapped
via write-to-staging + RENAME:

- ``ignore``   → target ∪ (source ⟕anti target on keys)
- ``update``   → (target ⟕anti source)  ∪  source-matched-or-new rows,
                 where matched rows take mapped columns from source and
                 keep unmapped target columns
- ``exception``→ raise if any source key already exists in target
                 (reference enforces via unique constraint,
                 ``databases/base.py:201-209``; Spark has no constraints →
                 duplicate-join assertion)

Semantics decision (SURVEY §7 risk list): when the SOURCE has duplicate
conflict-keys, Delta MERGE errors while SQLite/Postgres dedupe row-by-row.
We pre-dedupe the source deterministically (first row per key by a stable
sort over all mapped columns) — the majority-dialect behavior.

Scale notes: both branches are one shuffle join on the conflict keys; with
AQE on, a small source side becomes a broadcast join automatically.  On a
Delta/Iceberg-enabled cluster, swap `_merge_plan`'s rewrite for the
catalog's native ``MERGE INTO`` (row-level update without full rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..exceptions import MergeConflictError, NonExistentTableError
from ..table import Table
from .append import normalize_columns


def merge(
    spark: SparkSession,
    source_table: Table,
    target_table: Table,
    target_conflict_columns: list[str],
    columns=None,
    if_conflicts: str = "exception",
) -> Table:
    if if_conflicts not in ("ignore", "update", "exception"):
        raise ValueError(f"invalid if_conflicts: {if_conflicts!r}")
    if not spark.catalog.tableExists(target_table.qualified_name):
        raise NonExistentTableError(
            f"merge target {target_table.qualified_name} does not exist"
        )

    target = spark.table(target_table.qualified_name)
    source = spark.table(source_table.qualified_name)
    col_map = normalize_columns(columns) or {c: c for c in source.columns}

    missing = [t for t in target_conflict_columns if t not in target.columns]
    if missing:
        raise ValueError(f"conflict columns missing from target: {missing}")

    # project source into target's column namespace
    source = source.select(*[F.col(s).alias(t) for s, t in col_map.items()])
    keys = target_conflict_columns

    if if_conflicts == "exception":
        clash = source.join(target.select(*keys), on=keys, how="inner")
        n = clash.limit(1).count()
        if n > 0:
            raise MergeConflictError(
                f"merge(if_conflicts='exception'): source keys already present "
                f"in {target_table.qualified_name}"
            )
        result = _insert_only(target, source, keys)
    else:
        # deterministic source dedupe on keys (see module docstring)
        order_cols = [F.col(c) for c in source.columns]
        w = Window.partitionBy(*keys).orderBy(*order_cols)
        source = (
            source.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if if_conflicts == "ignore":
            result = _insert_only(target, source, keys)
        else:  # update
            result = _upsert(target, source, keys)

    _swap_table(spark, result, target_table)
    return target_table


def _insert_only(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    new_rows = source.join(target.select(*keys), on=keys, how="left_anti")
    aligned = _align(new_rows, target)
    return target.unionByName(aligned)


def _upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE ... WHEN MATCHED UPDATE SET <mapped cols> WHEN NOT MATCHED INSERT."""
    src = source.select(
        *[F.col(c).alias(f"__src_{c}") for c in source.columns]
    )
    cond = [F.col(k) == F.col(f"__src_{k}") for k in keys]
    joined = target.join(src, on=cond, how="full_outer")

    out_cols = []
    for c in target.columns:
        src_c = f"__src_{c}"
        if src_c in src.columns:
            # matched or source-only: take source value; target-only: keep target
            out_cols.append(
                F.when(F.col(f"__src_{keys[0]}").isNotNull(), F.col(src_c))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c).alias(c))
    return joined.select(*out_cols)


def _align(df: DataFrame, target: DataFrame) -> DataFrame:
    return df.select(
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in target.schema.fields
        ]
    )


def _swap_table(spark: SparkSession, result: DataFrame, target_table: Table) -> None:
    """Write result to a staging table, then atomically swap names.

    Avoids Spark's cannot-overwrite-a-table-being-read restriction without
    caching the whole result on the driver.
    """
    name = target_table.qualified_name
    staging = f"{target_table.name}__astro_merge_staging"
    if target_table.metadata.schema and not target_table.temp:
        staging = f"{target_table.metadata.schema}.{staging}"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    result.write.mode("overwrite").format("parquet").saveAsTable(staging)
    spark.sql(f"DROP TABLE {name}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {name}")
    # The rename moves data files under the target's directory; drop any
    # cached file listing for the old generation or the next read fails
    # with FILE_NOT_EXIST.
    spark.catalog.refreshTable(name)
