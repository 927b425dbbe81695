"""OpenLineage-shaped dataset facets for the ELT operators.

Reference parity: ``lineage/facets.py:1-143`` plus each operator's
``get_openlineage_facets_on_complete`` (``sql/operators/load_file.py:
245-343``, ``export_to_file.py``, ``merge.py``, ``base_decorator.py``).
The reference builds ``openlineage.client`` payloads for Airflow's
extractor; this engine has no Airflow dependency, so the SAME shapes —
input/output datasets with ``dataSource`` / ``schema`` /
``outputStatistics`` facets, job facets with the SQL text — are emitted
as plain JSON-able dicts into a session-scoped buffer.

Opt-in by design: facet building costs one ``count()`` (the
``outputStatistics.rowCount``) and one file listing per operator —
never paid unless ``enable(spark)`` ran.  The hot path sees a single
``is_enabled`` set-membership test.

Usage::

    from astro_spark import lineage
    lineage.enable(spark)
    a.load_file(spark, path, output_table=t)
    ev = lineage.last(spark)
    ev["outputs"][0]["facets"]["outputStatistics"]["rowCount"]

Scale note: facets describe DATASETS, not rows — nothing here ships
data.  The input-file facet caps its per-file listing at
``_MAX_LISTED_FILES`` entries and says so (``"truncated": True``), so a
100k-file load never serializes a 100k-element lineage payload;
``number_of_files`` is always the true count.
"""

from __future__ import annotations

from typing import Any

_PRODUCER = "astro_spark"
_MAX_LISTED_FILES = 100

_ENABLED: set[int] = set()
_BUFFERS: dict[int, list[dict]] = {}


def enable(spark) -> None:
    """Start collecting lineage events for this session."""
    _ENABLED.add(id(spark))
    _BUFFERS.setdefault(id(spark), [])


def disable(spark) -> None:
    _ENABLED.discard(id(spark))


def is_enabled(spark) -> bool:
    return id(spark) in _ENABLED


def events(spark) -> list[dict]:
    """All collected events for this session, oldest first."""
    return list(_BUFFERS.get(id(spark), []))


def last(spark) -> dict | None:
    evs = _BUFFERS.get(id(spark)) or []
    return evs[-1] if evs else None


def clear(spark) -> None:
    _BUFFERS.pop(id(spark), None)


# --------------------------------------------------------------------------
# facet builders (OpenLineage spec shapes, as plain dicts)
# --------------------------------------------------------------------------


def schema_facet(df) -> dict:
    """OpenLineage ``SchemaDatasetFacet``: one field per column."""
    return {
        "fields": [
            {"name": f.name, "type": f.dataType.simpleString()}
            for f in df.schema.fields
        ]
    }


def data_source_facet(name: str, uri: str) -> dict:
    """OpenLineage ``DataSourceDatasetFacet``."""
    return {"name": name, "uri": uri}


def output_statistics_facet(row_count: int, size: int | None = None) -> dict:
    """OpenLineage ``OutputStatisticsOutputDatasetFacet``."""
    out: dict[str, Any] = {"rowCount": int(row_count)}
    if size is not None:
        out["size"] = int(size)
    return out


def sql_job_facet(query: str) -> dict:
    """OpenLineage ``SqlJobFacet``."""
    return {"query": query}


def dataset(namespace: str, name: str, facets: dict) -> dict:
    return {"namespace": namespace, "name": name, "facets": facets}


def operator_lineage(
    op: str,
    inputs: list[dict],
    outputs: list[dict],
    run_facets: dict | None = None,
    job_facets: dict | None = None,
) -> dict:
    """The reference's ``OperatorLineage(inputs, outputs, run_facets,
    job_facets)`` tuple as a dict, tagged with the operator name."""
    return {
        "producer": _PRODUCER,
        "operator": op,
        "inputs": inputs,
        "outputs": outputs,
        "run_facets": run_facets or {},
        "job_facets": job_facets or {},
    }


def _split_uri(uri: str) -> tuple[str, str]:
    """(namespace, name) split of a dataset URI — scheme://authority is
    the namespace, the path the name (OpenLineage naming convention)."""
    if "://" in uri:
        scheme, rest = uri.split("://", 1)
        if "/" in rest:
            authority, path = rest.split("/", 1)
            return f"{scheme}://{authority}", "/" + path
        return f"{scheme}://{rest}", "/"
    return "file://", uri


def _input_file_dataset(spark, input_file) -> dict:
    """Input dataset for a File: ``dataSource`` + the reference's
    ``InputFileDatasetFacet`` (number_of_files, is_pattern, per-file
    path/size — capped, see module docstring)."""
    from .operators.files import get_file_list

    uri = input_file.dataset_uri
    namespace, name = _split_uri(uri)
    try:
        listed = get_file_list(spark, input_file.path)
    except Exception:
        listed = []
    files = []
    for p in listed[:_MAX_LISTED_FILES]:
        size = None
        try:
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
            jp = jvm.org.apache.hadoop.fs.Path(p)
            size = int(jp.getFileSystem(hconf).getFileStatus(jp).getLen())
        except Exception:
            pass
        files.append(
            {
                "filepath": p,
                "file_size": size,
                "file_type": (
                    input_file.filetype.value if input_file.filetype else None
                ),
            }
        )
    facet: dict[str, Any] = {
        "number_of_files": len(listed),
        "is_pattern": bool(input_file.is_pattern),
        "files": files,
    }
    if len(listed) > _MAX_LISTED_FILES:
        facet["truncated"] = True
    return dataset(
        namespace,
        name,
        {
            "input_file_facet": facet,
            "dataSource": data_source_facet(name, uri),
        },
    )


def _table_output_dataset(spark, table, df=None) -> dict:
    """Output dataset for a Table/VersionedTable: ``dataSource`` +
    ``schema`` + ``outputStatistics`` (rowCount via one count())."""
    from .operators.timetravel import VersionedTable, tt_read

    if isinstance(table, VersionedTable):
        uri = f"file://{table.root}" if "://" not in table.root else table.root
        namespace, name = _split_uri(uri)
        if df is None:
            df = tt_read(spark, table.root)
        display = table.root
    else:
        uri = table.dataset_uri
        namespace, name = table.conn_id or "astro", table.qualified_name
        if df is None:
            df = spark.table(table.qualified_name)
        display = table.qualified_name
    return dataset(
        namespace,
        name,
        {
            "dataSource": data_source_facet(display, uri),
            "schema": schema_facet(df),
            "outputStatistics": output_statistics_facet(df.count()),
        },
    )


def _table_input_dataset(spark, table) -> dict:
    """Input dataset for a Table: ``dataSource`` + ``schema`` + the
    reference's ``TableDatasetFacet`` row count."""
    df = spark.table(table.qualified_name)
    return dataset(
        table.conn_id or "astro",
        table.qualified_name,
        {
            "dataSource": data_source_facet(
                table.qualified_name, table.dataset_uri
            ),
            "schema": schema_facet(df),
            "table_facet": {
                "table_name": table.qualified_name,
                "columns": list(df.columns),
                "source_table_rows": df.count(),
            },
        },
    )


def _emit(spark, event: dict) -> None:
    _BUFFERS.setdefault(id(spark), []).append(event)


# --------------------------------------------------------------------------
# per-operator emitters (called by the operators when enabled)
# --------------------------------------------------------------------------


def emit_load_file(spark, input_file, result, df) -> None:
    """load_file's facets (reference ``load_file.py:245-343``):
    input = the file dataset, output = the table (when one was made)."""
    from .table import Table
    from .operators.timetravel import VersionedTable

    inputs = [_input_file_dataset(spark, input_file)]
    outputs = []
    if isinstance(result, (Table, VersionedTable)):
        outputs = [_table_output_dataset(spark, result)]
    else:
        # DataFrame return: no materialized output dataset (the
        # reference emits outputs only for tables) — record the schema
        # as a run facet so the event still describes what was read
        inputs[0]["facets"]["schema"] = schema_facet(df)
    _emit(spark, operator_lineage("load_file", inputs, outputs))


def emit_transform(spark, sql: str, result) -> None:
    """transform's facets (reference ``base_decorator.py``): the SQL
    text as the job facet, the output table as the output dataset."""
    _emit(
        spark,
        operator_lineage(
            "transform",
            [],
            [_table_output_dataset(spark, result)],
            job_facets={"sql": sql_job_facet(sql)},
        ),
    )


def emit_merge(
    spark,
    source_table,
    target_table,
    target_conflict_columns,
    if_conflicts: str,
) -> None:
    """merge's facets (reference ``merge.py`` — Source/TargetTableMerge
    DatasetFacet): source table with row count + conflict strategy,
    target table with conflict columns + post-merge row count."""
    src = _table_input_dataset(spark, source_table)
    src["facets"]["table_facet"]["if_conflicts"] = if_conflicts
    tgt = _table_output_dataset(spark, target_table)
    tgt["facets"]["target_merge_facet"] = {
        "table_name": target_table.qualified_name,
        "target_conflict_columns": list(target_conflict_columns),
    }
    _emit(spark, operator_lineage("merge", [src], [tgt]))


def emit_export(spark, df, output_file, if_exists: str) -> None:
    """export_to_file's facets (reference ``export_to_file.py`` —
    ExportFileFacet): output = the file dataset with row count, size,
    type, and the if_exists strategy."""
    uri = output_file.dataset_uri
    namespace, name = _split_uri(uri)
    size = None
    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        jp = jvm.org.apache.hadoop.fs.Path(output_file.path)
        fs = jp.getFileSystem(hconf)
        size = int(fs.getContentSummary(jp).getLength())
    except Exception:
        pass
    out = dataset(
        namespace,
        name,
        {
            "dataSource": data_source_facet(name, uri),
            "schema": schema_facet(df),
            "outputStatistics": output_statistics_facet(df.count(), size),
            "export_file_facet": {
                "filepath": output_file.path,
                "file_size": size,
                "file_type": (
                    output_file.filetype.value if output_file.filetype else None
                ),
                "if_exists": if_exists,
            },
        },
    )
    _emit(spark, operator_lineage("export_to_file", [], [out]))
