"""Spark 4 Python Data Source for versioned-parquet tables — the
ecosystem half of the Delta parity story.

``operators/timetravel.py`` gives the engine its own API (``tt_read`` /
``tt_changes`` / drains), which is the FAST path: explicit file lists
feed Spark's native parquet scan, so pushdown/pruning stay JVM-side.
What that API cannot give is *format-string* integration — third-party
code that only knows ``spark.read.format(...)`` / ``readStream`` —
which is exactly how Delta ships its table format.  Spark 4's Python
Data Source API (`pyspark.sql.datasource`) closes that gap without a
JVM extension:

    from astro_spark.sources.tt_datasource import register
    register(spark)

    spark.read.format("versioned_parquet").option("path", root).load()
    spark.read.format("versioned_parquet").option("path", root) \
         .option("versionAsOf", "2").load()

    (spark.readStream.format("versioned_parquet")
          .option("path", root).load()          # appends per commit,
          .groupBy(...).agg(...) ...)           # Delta-source contract

Batch reads resolve the requested version through the manifest log
(checkpointed or inline) and decode the data files with Arrow — one
InputPartition per file, so parallelism matches the file layout.  The
STREAMING source follows Delta's: each micro-batch is the rows of the
files ADDED by commits in (start offset, end offset]; a commit that
also REMOVED files (merge/delete/update/overwrite/restore) is a
rewrite the append-stream cannot represent and raises, unless
``ignoreChanges=true`` (then the added files stream anyway and carried
rows may duplicate — Delta's exact ``ignoreChanges`` trade).  Each row
carries ``_commit_version``.

The Arrow-decode path costs more CPU per byte than the JVM scan — for
engine-internal work prefer ``tt_read``/``tt_changes_drain``; this
source exists so everything else on a cluster can read the format.
Filesystem access is ``pyarrow.fs.FileSystem.from_uri`` (local paths
always; object stores wherever pyarrow's bundled filesystems reach).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_LOG = "_log"
_PAD = 8


def _fs_of(root: str):
    from pyarrow import fs as pafs

    if "://" in root:
        f, path = pafs.FileSystem.from_uri(root)
        return f, path
    return pafs.LocalFileSystem(), os.path.abspath(root)


def _list_versions(root: str) -> list[int]:
    from pyarrow import fs as pafs

    f, path = _fs_of(root)
    sel = pafs.FileSelector(f"{path}/{_LOG}", allow_not_found=True)
    out = []
    for info in f.get_file_info(sel):
        name = info.base_name
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(root: str, version: int) -> dict:
    f, path = _fs_of(root)
    with f.open_input_stream(
        f"{path}/{_LOG}/v{version:0{_PAD}d}.json"
    ) as stream:
        return json.loads(stream.read().decode("utf-8"))


def _resolve_files(root: str, manifest: dict) -> list[str]:
    """Complete file list — inline form verbatim, checkpoint form =
    parquet base snapshot minus remove plus add (mirrors
    ``timetravel._resolve`` without a SparkSession)."""
    if "base" not in manifest:
        return manifest.get("files") or []
    import pyarrow.parquet as pq

    f, path = _fs_of(root)
    with f.open_input_file(f"{path}/{manifest['base']}") as fh:
        files = pq.read_table(fh, columns=["file"]).column("file").to_pylist()
    rm = set(manifest.get("remove") or [])
    if rm:
        files = [x for x in files if x not in rm]
    return files + (manifest.get("add") or [])


def _pick_version(root: str, options: dict) -> int:
    versions = _list_versions(root)
    if not versions:
        raise ValueError(f"no versioned table at {root}")
    v = options.get("versionasof")
    ts = options.get("timestampasof")
    if v is not None and ts is not None:
        raise ValueError("pass at most one of versionAsOf / timestampAsOf")
    if v is not None:
        v = int(v)
        if v not in versions:
            raise ValueError(f"version {v} not found in {root}")
        return v
    if ts is not None:
        ts = float(ts)
        eligible = [
            x for x in versions if _read_manifest(root, x)["ts"] <= ts
        ]
        if not eligible:
            raise ValueError(f"no version at or before ts={ts} in {root}")
        return eligible[-1]
    return versions[-1]


def _spark_schema(manifest: dict) -> StructType:
    if manifest.get("schema") is None:
        raise ValueError(
            "manifest carries no schema (pre-schema-log table) — read it "
            "through astro_spark.tt_read instead"
        )
    return StructType.fromJson(json.loads(manifest["schema"]))


@dataclass
class _FilePartition(InputPartition):
    path: str
    commit_version: int = -1


def _arrow_batches(abs_path: str, schema: StructType, commit_version: int):
    """Decode one data file into Arrow batches aligned to the LOG's
    schema: missing columns (pre-evolution files) materialize as NULL,
    extra file columns drop — the same log-owned-schema contract as
    ``tt_read``."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    want = to_arrow_schema(schema)
    f, path = _fs_of(abs_path)
    with f.open_input_file(path) as fh:
        table = pq.read_table(fh)
    cols = []
    for field in want:
        if field.name == "_commit_version":
            cols.append(
                pa.array([commit_version] * len(table), type=field.type)
            )
        elif field.name in table.column_names:
            cols.append(table.column(field.name).cast(field.type))
        else:
            cols.append(pa.nulls(len(table), type=field.type))
    out = pa.table(dict(zip([f.name for f in want], cols)))
    yield from out.to_batches(max_chunksize=1 << 16)


class _TTBatchReader(DataSourceReader):
    def __init__(self, root: str, schema: StructType, options: dict):
        self._root = root
        self._schema = schema
        self._version = _pick_version(root, options)

    def partitions(self):
        manifest = _read_manifest(self._root, self._version)
        _f, path = _fs_of(self._root)
        return [
            _FilePartition(f"{path}/{rel}", self._version)
            for rel in _resolve_files(self._root, manifest)
        ] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        yield from _arrow_batches(
            partition.path, self._schema, partition.commit_version
        )


class _TTStreamReader(DataSourceStreamReader):
    """Delta-source semantics: offsets are committed versions; a batch
    is the ADDED files of versions in (start, end]."""

    def __init__(self, root: str, schema: StructType, options: dict):
        self._root = root
        self._schema = schema
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        start = options.get("startingversion")
        if start is None:
            versions = _list_versions(root)
            if not versions:
                raise ValueError(f"no versioned table at {root}")
            # Delta's default: start from the current snapshot — only
            # commits AFTER registration stream.  startingVersion=0
            # replays the whole history (v0's files arrive as version 0
            # via the (start-1, end] window below).
            self._start = versions[-1]
        else:
            self._start = int(start) - 1
        self._prev_files: dict[int, list[str]] | None = None

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        versions = _list_versions(self._root)
        return {"version": versions[-1] if versions else self._start}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return [_FilePartition("")]
        _f, path = _fs_of(self._root)
        out: list[_FilePartition] = []
        prev: list[str] | None = None
        versions = [v for v in _list_versions(self._root) if v <= hi]
        for v in versions:
            manifest = _read_manifest(self._root, v)
            files = _resolve_files(self._root, manifest)
            if v > lo:
                prev_set = set(prev or [])
                added = [f for f in files if f not in prev_set]
                removed = prev is not None and any(
                    f not in set(files) for f in prev
                )
                if removed and not self._ignore_changes:
                    raise ValueError(
                        f"version {v} of {self._root} rewrote data files "
                        "(merge/delete/update/overwrite) — an append "
                        "stream cannot represent it; set "
                        "ignoreChanges=true to stream the added files "
                        "anyway (carried rows may duplicate), or consume "
                        "astro_spark.tt_changes_drain for the exact feed"
                    )
                out.extend(
                    _FilePartition(f"{path}/{rel}", v) for rel in added
                )
            prev = files
        return out or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        yield from _arrow_batches(
            partition.path, self._schema, partition.commit_version
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream's checkpoint; nothing to ack


class VersionedParquetDataSource(DataSource):
    """``format("versioned_parquet")`` — batch + streaming reads of the
    ``operators/timetravel.py`` log through Spark's data source API."""

    @classmethod
    def name(cls) -> str:
        return "versioned_parquet"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError(
                "versioned_parquet: .option('path', <root>) is required"
            )
        return root

    def schema(self) -> StructType:
        root = self._root()
        manifest = _read_manifest(root, _pick_version(root, self.options))
        st = _spark_schema(manifest)
        # the change-tracking column is part of the DECLARED schema when
        # asked for (Spark resolves the plan from schema(), which cannot
        # know batch vs stream): stream rows carry their commit's
        # version, batch rows the selected snapshot's
        if (
            str(self.options.get("includecommitversion", "false")).lower()
            == "true"
        ):
            from pyspark.sql.types import LongType, StructField

            st = StructType(
                st.fields + [StructField("_commit_version", LongType())]
            )
        return st

    def reader(self, schema: StructType) -> _TTBatchReader:
        return self._reader_with(schema, _TTBatchReader)

    def streamReader(self, schema: StructType) -> _TTStreamReader:
        return self._reader_with(schema, _TTStreamReader)

    def _reader_with(self, schema: StructType, cls):
        return cls(self._root(), schema, dict(self.options))


def register(spark) -> None:
    """Register the format with a session:
    ``spark.read.format('versioned_parquet')`` afterwards."""
    spark.dataSource.register(VersionedParquetDataSource)
