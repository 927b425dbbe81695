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
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_LOG = "_log"
_PAD = 8


def _abs_entry(path: str, rel: str) -> str:
    """Shallow-clone manifest entries are absolute paths/URIs into the
    source table's root; everything else is root-relative."""
    return rel if (rel.startswith("/") or "://" in rel) else f"{path}/{rel}"


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
    return _resolve_files_stats(root, manifest)[0]


def _resolve_files_stats(
    root: str, manifest: dict
) -> tuple[list[str], dict]:
    """(complete file list, per-file stats) resolved pyarrow-side."""
    if "base" not in manifest:
        return (
            manifest.get("files") or [],
            manifest.get("stats") or {},
        )
    import pyarrow.parquet as pq

    f, path = _fs_of(root)
    with f.open_input_file(f"{path}/{manifest['base']}") as fh:
        t = pq.read_table(fh)
    files = t.column("file").to_pylist()
    raw = t.column("stats").to_pylist()
    stats = {x: json.loads(s) for x, s in zip(files, raw) if s is not None}
    rm = set(manifest.get("remove") or [])
    if rm:
        files = [x for x in files if x not in rm]
        stats = {x: s for x, s in stats.items() if x not in rm}
    files = files + (manifest.get("add") or [])
    stats.update(manifest.get("add_stats") or {})
    return files, stats


def _parse_temporal_ds(v):
    """datetime for a canonical date/timestamp string, else None —
    mirrors ``timetravel._parse_temporal`` without a SparkSession."""
    from datetime import datetime

    if not isinstance(v, str):
        return None
    try:
        return datetime.fromisoformat(v)
    except ValueError:
        return None


def _skip_provable_ds(rng, lo, hi) -> bool:
    """``timetravel._skip_provable``'s exact logic: temporal string
    bounds compare in time space, cross-type proves nothing."""
    r0, r1 = rng[0], rng[1]
    t0, t1 = _parse_temporal_ds(r0), _parse_temporal_ds(r1)
    if t0 is not None and t1 is not None:
        # offset-aware vs naive datetimes (e.g. a pre-fix manifest
        # serialized '+00:00' bounds) raise TypeError on <: proves
        # nothing — keep the file (sound)
        try:
            if hi is not None:
                th = _parse_temporal_ds(hi)
                if th is not None and t0 > th:
                    return True
            if lo is not None:
                tl = _parse_temporal_ds(lo)
                if tl is not None and t1 < tl:
                    return True
        except TypeError:
            return False
        return False
    try:
        if hi is not None and r0 > hi:
            return True
        if lo is not None and r1 < lo:
            return True
    except TypeError:
        return False
    return False


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
    # JSON {col: value} for ADOPTED Hive files (tt_convert), whose
    # partition values live only in their key=value path segments —
    # engine-written files carry the columns physically and leave this
    # empty
    part_json: str = ""


def _partition_path_values(rel: str, partition_cols: list[str]) -> dict:
    """{col: typed value} parsed from ``key=value`` path segments —
    mirrors ``timetravel._partition_values`` without a SparkSession.
    Only ADOPTED files need this (engine layout uses ``__p_`` segments
    AND keeps the column in the data)."""
    from urllib.parse import unquote

    pset = set(partition_cols)
    out: dict = {}
    for seg in rel.split("/")[:-1]:
        k, sep, v = seg.partition("=")
        if not sep:
            continue
        if k.startswith("__p_"):
            k = k[len("__p_"):]
        if k not in pset:
            continue
        v = unquote(v)
        if v == "__HIVE_DEFAULT_PARTITION__":
            out[k] = None
            continue
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out


def _part_json_for(rel: str, partition_cols: list[str]) -> str:
    """Serialized path values for a manifest entry, or '' when the
    file carries its partition columns physically."""
    if not partition_cols or rel.startswith("files/"):
        return ""
    vals = _partition_path_values(rel, partition_cols)
    return json.dumps(vals) if vals else ""


def _arrow_batches(
    abs_path: str,
    schema: StructType,
    commit_version: int,
    part_json: str = "",
):
    """Decode one data file into Arrow batches aligned to the LOG's
    schema: missing columns (pre-evolution files) materialize as NULL,
    extra file columns drop — the same log-owned-schema contract as
    ``tt_read``.  Adopted Hive files materialize their path-derived
    partition values (``part_json``) as constants."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    part_vals = json.loads(part_json) if part_json else {}
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
        elif field.name in part_vals and part_vals[field.name] is not None:
            cols.append(
                pa.array([part_vals[field.name]] * len(table)).cast(
                    field.type
                )
            )
        else:
            cols.append(pa.nulls(len(table), type=field.type))
    out = pa.table(dict(zip([f.name for f in want], cols)))
    yield from out.to_batches(max_chunksize=1 << 16)


class _TTBatchReader(DataSourceReader):
    def __init__(self, root: str, schema: StructType, options: dict):
        self._root = root
        self._schema = schema
        self._version = _pick_version(root, options)
        self._bounds: dict[str, list] = {}

    def pushFilters(self, filters):
        """Catalyst's pushed conjuncts become manifest skip bounds —
        the format path gets Delta's stats-based file pruning for free
        on `.where("k > 5")`.  Every filter is also yielded back:
        file-granularity pruning is partial, Spark re-applies the
        predicate exactly."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        def _tighten(col: str, lo, hi) -> None:
            cur = self._bounds.setdefault(col, [None, None])
            if lo is not None and (cur[0] is None or lo > cur[0]):
                cur[0] = lo
            if hi is not None and (cur[1] is None or hi < cur[1]):
                cur[1] = hi

        for flt in filters:
            attr = getattr(flt, "attribute", None)
            val = getattr(flt, "value", None)
            if (
                attr is not None
                and len(attr) == 1
                and isinstance(val, (int, float, str))
            ):
                col = attr[0]
                if isinstance(flt, EqualTo):
                    _tighten(col, val, val)
                elif isinstance(flt, (GreaterThan, GreaterThanOrEqual)):
                    _tighten(col, val, None)  # strict widens: sound
                elif isinstance(flt, (LessThan, LessThanOrEqual)):
                    _tighten(col, None, val)
            yield flt  # Spark always re-applies — pruning is partial

    def partitions(self):
        manifest = _read_manifest(self._root, self._version)
        files, stats = _resolve_files_stats(self._root, manifest)
        if self._bounds:

            def _keep(rel: str) -> bool:
                st = stats.get(rel)
                if st is None:
                    return True  # absence is never evidence
                for col, (lo, hi) in self._bounds.items():
                    rng = st.get(col)
                    if rng is None or rng[0] is None or rng[1] is None:
                        continue
                    if _skip_provable_ds(rng, lo, hi):
                        return False
                return True

            files = [rel for rel in files if _keep(rel)]
        _f, path = _fs_of(self._root)
        pcols = list(manifest.get("partition_cols") or [])
        return [
            _FilePartition(
                _abs_entry(path, rel),
                self._version,
                _part_json_for(rel, pcols),
            )
            for rel in files
        ] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        yield from _arrow_batches(
            partition.path,
            self._schema,
            partition.commit_version,
            partition.part_json,
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
        self._ignore_deletes = (
            str(options.get("ignoredeletes", "false")).lower() == "true"
        )
        start = options.get("startingversion")
        start_ts = options.get("startingtimestamp")
        if start is not None and start_ts is not None:
            raise ValueError(
                "pass at most one of startingVersion / startingTimestamp"
            )
        if start_ts is not None:
            # Delta's startingTimestamp: stream every commit whose
            # timestamp is AT or AFTER the given clock (the first such
            # version streams inclusively); if none exists yet, only
            # future commits stream.  Accepts unix-epoch numerics AND
            # the timestamp-string form Delta's option takes
            # ('2026-08-16 00:00:00' — session-local, like the RESTORE
            # route).
            versions = _list_versions(root)
            if not versions:
                raise ValueError(f"no versioned table at {root}")
            try:
                ts = float(start_ts)
            except (TypeError, ValueError):
                from datetime import datetime

                ts = datetime.fromisoformat(str(start_ts)).timestamp()
            later = [
                v for v in versions if _read_manifest(root, v)["ts"] >= ts
            ]
            if later and later[0] - 1 >= 0 and (later[0] - 1) not in versions:
                # the version preceding the first qualifying commit was
                # vacuumed: later[0] is the oldest SURVIVING state, so
                # stream it as a full replay (lo == -1 semantics) —
                # raising the vacuumed-offset error here would wedge a
                # brand-new stream that never had an offset to lose
                self._start = -1 if later[0] == versions[0] else later[0] - 1
            else:
                self._start = (later[0] - 1) if later else versions[-1]
        elif start is None:
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
        all_versions = _list_versions(self._root)
        # seed the prev file set AT the start offset (one manifest read),
        # then walk only (lo, hi] — a micro-batch costs O(batch versions)
        # manifest reads, not O(table lifetime)
        base = [v for v in all_versions if v <= lo]
        if lo >= 0 and not base:
            # the checkpointed offset version was vacuumed: seeding
            # prev=None here would silently re-emit every file of the
            # first surviving version as 'added' — a full replay
            # indistinguishable from the intentional startingVersion=0
            # path (lo == -1).  Fail loudly instead (Delta does too).
            raise ValueError(
                f"stream offset version {lo} of {self._root} has been "
                "vacuumed — the source cannot compute the file delta. "
                "Restart with a fresh checkpoint: the default start "
                "(current snapshot) streams commits from now on, or "
                "startingVersion=0 replays everything that survives; "
                "a startingVersion pointing at a vacuumed boundary "
                "re-raises this error"
            )
        prev: set[str] | None = (
            set(
                _resolve_files(
                    self._root, _read_manifest(self._root, base[-1])
                )
            )
            if base
            else None
        )
        for v in [v for v in all_versions if lo < v <= hi]:
            manifest = _read_manifest(self._root, v)
            files = _resolve_files(self._root, manifest)
            pcols = list(manifest.get("partition_cols") or [])
            fset = set(files)
            added = [f for f in files if prev is None or f not in prev]
            removed = prev is not None and not prev <= fset
            if (
                removed
                and not added
                and (self._ignore_deletes or self._ignore_changes)
            ):
                # a DELETE-ONLY commit (vacuumed partitions, retention
                # deletes): Delta's ignoreDeletes skips it silently —
                # no rows to emit, the file-set baseline just shrinks
                prev = fset
                continue
            if removed and not self._ignore_changes:
                raise ValueError(
                    f"version {v} of {self._root} rewrote data files "
                    "(merge/delete/update/overwrite) — an append "
                    "stream cannot represent it; set "
                    "ignoreChanges=true to stream the added files "
                    "anyway (carried rows may duplicate), "
                    "ignoreDeletes=true to skip DELETE-ONLY commits, "
                    "or consume astro_spark.tt_changes_drain for the "
                    "exact feed"
                )
            out.extend(
                _FilePartition(
                    _abs_entry(path, rel), v, _part_json_for(rel, pcols)
                )
                for rel in added
            )
            prev = fset
        return out or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        yield from _arrow_batches(
            partition.path,
            self._schema,
            partition.commit_version,
            partition.part_json,
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream's checkpoint; nothing to ack


class _TTWriteMessage(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


# -- Spark-free log commit ---------------------------------------------------
#
# Spark runs a Python STREAMING sink's commit() in a detached runner
# process with no JVM gateway: `SparkSession.builder.getOrCreate()`
# there boots an ENTIRE fresh local JVM (~7-9 s per stream start,
# measured) just to publish one manifest.  The rest of this data source
# is already Spark-free (pyarrow manifests + Arrow decode), so the
# commit gets the same treatment: validate + build + atomically publish
# the manifest with pyarrow/os only, mirroring
# ``timetravel.tt_commit_files`` field-for-field.  Conditions the
# Arrow path can't honor (non-local root — no O_EXCL put-if-absent;
# CHECK constraints — Spark SQL expressions; exotic stats types) raise
# ``_ArrowCommitUnsupported`` BEFORE anything publishes and fall back
# to the session path, so semantics never fork.

_INLINE_MAX_DEFAULT = 1000  # timetravel's spark.astro.tt.inlineFilesMax


class _ArrowCommitUnsupported(Exception):
    """The Spark-free commit can't honor this table/root — fall back."""


class _ArrowCommitRace(Exception):
    """Another writer published the raced version (retry the head)."""


def _local_root(root: str) -> str:
    """Absolute local path of ``root``, or raise (the Arrow commit's
    isolation story is os.O_EXCL put-if-absent — local/NFS only; other
    filesystems take the session path)."""
    if root.startswith("file://"):
        root = root[len("file://"):]
    if "://" in root:
        raise _ArrowCommitUnsupported(f"non-local root {root!r}")
    return os.path.abspath(root)


def _atomic_publish_arrow(path: str, version: int, manifest: dict) -> None:
    """Put-if-absent of the manifest WITH its content (r14): the former
    O_CREAT|O_EXCL-then-write claimed the slot atomically but exposed a
    zero-length file to concurrent readers until the write landed (a
    reader racing the commit got JSONDecodeError — caught by the
    linearizability property test), and a writer crash in the window
    would wedge the version slot.  Write the full JSON to a hidden temp
    name first, then ``os.link`` it into place: link(2) fails EEXIST
    atomically and the manifest carries complete content from its first
    visible instant (works on local and NFS, the same scope as the old
    O_EXCL story)."""
    import uuid as _uuid

    log_dir = f"{path}/{_LOG}"
    os.makedirs(log_dir, exist_ok=True)
    name = f"v{version:0{_PAD}d}.json"
    tmp = f"{log_dir}/.{name}.tmp-{_uuid.uuid4().hex}"
    payload = json.dumps(manifest).encode("utf-8")
    with open(tmp, "wb") as fh:
        fh.write(payload)
    try:
        os.link(tmp, f"{log_dir}/{name}")
    except FileExistsError as exc:
        raise _ArrowCommitRace(
            f"version {version} was committed by another writer"
        ) from exc
    except OSError:
        # Mounts without hard-link support (SMB/FAT/some FUSE) raise
        # EPERM/ENOTSUP from link(2) (ADVICE r14): fall back to the old
        # O_CREAT|O_EXCL open — the empty-file exposure window is the
        # prior status quo on exactly those filesystems.
        _excl_publish(f"{log_dir}/{name}", payload, version)
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass


def _excl_publish(target: str, payload: bytes, version: int) -> None:
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise _ArrowCommitRace(
            f"version {version} was committed by another writer"
        ) from exc
    try:
        os.write(fd, payload)
    finally:
        os.close(fd)


def _files_schema_arrow(path: str, files: list[str]):
    """Unified Spark StructType of the just-written files' footers.
    pyarrow-level failures (conflicting footers → ArrowInvalid, footer
    read → OSError) defer to the session path, which produces the
    authoritative result or error — the documented 'falls back so
    semantics never fork' contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    try:
        merged = None
        for rel in files:
            s = pq.read_schema(f"{path}/{rel}")
            merged = s if merged is None else pa.unify_schemas([merged, s])
        return from_arrow_schema(merged)
    except (pa.ArrowInvalid, OSError) as exc:
        raise _ArrowCommitUnsupported(f"footer schema: {exc}") from exc


def _evolved_schema_arrow(prev_json: str | None, file_schema) -> str:
    """``timetravel._evolved_schema`` with merge_schema=False, on a
    footer-derived schema.  Any conflict defers to the session path —
    the JVM raises the authoritative error (a footer round-trip can
    disagree on e.g. timestamp NTZ-ness where the plan schema
    wouldn't), and the error path may be slow."""
    from pyspark.sql.types import StructType

    if prev_json is None:
        return json.dumps(file_schema.jsonValue())
    prev = StructType.fromJson(json.loads(prev_json))
    by_name = {f.name: f for f in prev.fields}
    for f in file_schema.fields:
        if f.name not in by_name:
            raise _ArrowCommitUnsupported(f"write adds column {f.name!r}")
        if by_name[f.name].dataType != f.dataType:
            raise _ArrowCommitUnsupported(f"type conflict on {f.name!r}")
    return prev_json  # no evolution possible with merge_schema=False


def _file_stats_arrow(
    path: str, files: list[str], stats_cols: list[str]
) -> dict:
    """Per-file [min, max] of the stats columns — exact, computed from
    a column-pruned Arrow read of the just-written (micro-batch-sized)
    files; int/float/string only, mirroring ``timetravel._STATS_TYPES``
    minus decimal (whose outward float-widening stays JVM-side)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out: dict = {}
    try:
        for rel in files:
            schema = pq.read_schema(f"{path}/{rel}")
            present = [c for c in stats_cols if c in schema.names]
            if not present:
                continue  # absence is never evidence: reader keeps the file
            for c in present:
                t = schema.field(c).type
                if not (
                    pa.types.is_integer(t)
                    or pa.types.is_floating(t)
                    or pa.types.is_string(t)
                    or pa.types.is_large_string(t)
                    or pa.types.is_date(t)
                    or pa.types.is_timestamp(t)
                ):
                    raise _ArrowCommitUnsupported(
                        f"stats col {c!r} type {t}"
                    )
            table = pq.read_table(f"{path}/{rel}", columns=present)
            entry = {}
            for c in present:
                mm = pc.min_max(table.column(c))
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if lo is None or hi is None:
                    continue  # all-NULL column: no bound to record
                import datetime as _dt

                if isinstance(lo, (_dt.date, _dt.datetime)):
                    # Spark's arrow batches carry timestamp[us, tz=…]
                    # (session tz); str() of the tz-aware value would
                    # store '… +00:00' strings that disagree with the
                    # session path's naive session-local strings AND
                    # parse back offset-aware, poisoning the skip
                    # compare.  Normalize: tz-aware → local wall time,
                    # naive — the session path's exact convention
                    # (Spark's session tz defaults to the JVM/OS tz).
                    if (
                        isinstance(lo, _dt.datetime)
                        and lo.tzinfo is not None
                    ):
                        lo = lo.astimezone().replace(tzinfo=None)
                        hi = hi.astimezone().replace(tzinfo=None)
                    # canonical strings — the session path's exact
                    # serialization (timetravel._json_safe_bound)
                    lo, hi = str(lo), str(hi)
                entry[c] = [lo, hi]
            if entry:
                out[rel] = entry
        return out
    except (pa.ArrowInvalid, OSError) as exc:
        # pyarrow-level stats failure: defer to the session path
        raise _ArrowCommitUnsupported(f"stats scan: {exc}") from exc


def _write_checkpoint_arrow(path: str, files: list[str], stats: dict) -> str:
    """``timetravel._write_checkpoint``'s exact layout, local-fs."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    rel = f"{_LOG}/ckpt-{_uuid.uuid4().hex}.parquet"
    table = pa.table(
        {
            "file": pa.array(files, type=pa.string()),
            "stats": pa.array(
                [json.dumps(stats[f]) if f in stats else None for f in files],
                type=pa.string(),
            ),
        }
    )
    os.makedirs(f"{path}/{_LOG}", exist_ok=True)
    pq.write_table(table, f"{path}/{rel}")
    return rel


def _body_full_arrow(
    path: str, files: list[str], stats: dict, inline_max: int
) -> dict:
    if len(files) <= inline_max:
        body: dict = {"files": files, "n_files": len(files)}
        if stats:
            body["stats"] = stats
        return body
    ref = _write_checkpoint_arrow(path, files, stats)
    return {"base": ref, "add": [], "remove": [], "n_files": len(files)}


def _body_delta_arrow(
    path: str,
    root: str,
    prev: dict,
    added: list[str],
    added_stats: dict,
    inline_max: int,
) -> dict:
    """``timetravel._body_delta`` for the append-only (removed=[]) case."""
    if "base" in prev:
        add = (prev.get("add") or []) + added
        remove = prev.get("remove") or []
        n_files = int(prev["n_files"]) + len(added)
        if len(add) + len(remove) <= inline_max:
            add_stats = {**(prev.get("add_stats") or {}), **added_stats}
            body: dict = {
                "base": prev["base"],
                "add": add,
                "remove": remove,
                "n_files": n_files,
            }
            if add_stats:
                body["add_stats"] = add_stats
            return body
        files, stats = _resolve_files_stats(root, prev)
        files = files + added
        stats = dict(stats)
        stats.update(added_stats)
        return _body_full_arrow(path, files, stats, inline_max)
    kept = prev.get("files") or []
    files = kept + added
    old = prev.get("stats") or {}
    stats = {f: old[f] for f in kept if f in old}
    stats.update(added_stats)
    return _body_full_arrow(path, files, stats, inline_max)


def _commit_files_arrow(
    root: str,
    new_files: list[str],
    mode: str,
    inline_max: int = _INLINE_MAX_DEFAULT,
    max_retries: int = 10,
) -> int:
    """Spark-free twin of ``timetravel.tt_commit_files``: same manifest
    fields, same append-race retry, same log layout — raises
    ``_ArrowCommitUnsupported`` (caller falls back to the session path)
    for non-local roots, constrained tables, schema drift, or exotic
    stats types.  Nothing publishes before every check passes."""
    import time as _time

    path = _local_root(root)
    file_schema = _files_schema_arrow(path, sorted(new_files))
    versions = _list_versions(root)
    if not versions:
        body = _body_full_arrow(path, sorted(new_files), {}, inline_max)
        manifest = {
            **body,
            "op": "create",
            "ts": _time.time(),
            "schema": json.dumps(file_schema.jsonValue()),
        }
        try:
            _atomic_publish_arrow(path, 0, manifest)
            return 0
        except _ArrowCommitRace:
            versions = _list_versions(root)  # lost create: append below
    def _scan_cols(prev: dict) -> tuple[list[str], list[str], list[str]]:
        """(stats_cols header, partition_cols header, columns to scan):
        partition columns join the stats scan — stream-written files
        carry them physically, and their bounds drive partition
        pruning exactly like the session path's ``_new_file_stats``."""
        carry = _manifest_stats_cols(prev)
        pcarry = list(prev.get("partition_cols") or [])
        present = {f.name for f in file_schema.fields}
        cols = [c for c in carry if c in present]
        cols += [c for c in pcarry if c in present and c not in cols]
        return carry, pcarry, cols

    if mode == "overwrite":
        prev = _read_manifest(root, versions[-1])
        if prev.get("constraints"):
            raise _ArrowCommitUnsupported("table has CHECK constraints")
        if prev.get("generated_cols"):
            # GENERATED ALWAYS AS expressions are Spark SQL — the
            # session path derives/validates them
            raise _ArrowCommitUnsupported("table has GENERATED columns")
        carry, pcarry, cols = _scan_cols(prev)
        stats = _file_stats_arrow(path, sorted(new_files), cols) if cols else {}
        manifest = {
            **_body_full_arrow(path, sorted(new_files), stats, inline_max),
            "op": "overwrite",
            "ts": _time.time(),
            "schema": json.dumps(file_schema.jsonValue()),
            **({"stats_cols": carry} if carry else {}),
            **({"partition_cols": pcarry} if pcarry else {}),
            **(
                {"properties": prev["properties"]}
                if prev.get("properties")
                else {}
            ),
        }
        _atomic_publish_arrow(path, versions[-1] + 1, manifest)
        return versions[-1] + 1
    for _ in range(max_retries):
        versions = _list_versions(root)
        head = versions[-1]
        prev = _read_manifest(root, head)
        if prev.get("constraints"):
            raise _ArrowCommitUnsupported("table has CHECK constraints")
        if prev.get("generated_cols"):
            raise _ArrowCommitUnsupported("table has GENERATED columns")
        evolved = _evolved_schema_arrow(prev.get("schema"), file_schema)
        carry, pcarry, cols = _scan_cols(prev)
        new_stats = (
            _file_stats_arrow(path, sorted(new_files), cols) if cols else {}
        )
        manifest = {
            **_body_delta_arrow(
                path, root, prev, sorted(new_files), new_stats, inline_max
            ),
            "op": "append",
            "ts": _time.time(),
            "schema": evolved,
            **({"stats_cols": carry} if carry else {}),
            **({"partition_cols": pcarry} if pcarry else {}),
            **(
                {"properties": prev["properties"]}
                if prev.get("properties")
                else {}
            ),
        }
        try:
            _atomic_publish_arrow(path, head + 1, manifest)
            return head + 1
        except _ArrowCommitRace:
            continue
    raise RuntimeError(
        f"lost the append race {max_retries} times at {root}"
    )


def _manifest_stats_cols(manifest: dict) -> list[str]:
    """``timetravel._stats_cols_of`` without a SparkSession."""
    cols = manifest.get("stats_cols")
    if cols:
        return list(cols)
    old = manifest.get("stats") or {}
    return sorted({c for st in old.values() for c in st})


class _TTArrowWriter(DataSourceArrowWriter):
    """Executor half: each task writes its Arrow batches as ONE parquet
    file under the commit's ``files/<uuid>/`` dir (invisible until the
    driver publishes a manifest); driver half: ``commit`` runs the SAME
    log transaction as ``tt_append``/``tt_overwrite``
    (``tt_commit_files`` — schema check, CHECK constraints on the
    read-back, skipping stats, append race retry), so
    ``df.write.format('versioned_parquet')`` is an ACID commit.  A
    failed/aborted job leaves invisible garbage only (``tt_vacuum``
    reclaims it) — exactly the engine-native writers' guarantee."""

    # a micro-batch spanning MANY partitions would explode into tiny
    # files; past this many distinct values the task writes one file
    # (stats simply record the wider [min, max] — sound, less pruning)
    _MAX_PARTITION_SPLITS = 32

    def __init__(self, root: str, overwrite: bool):
        import uuid as _uuid

        self._root = root
        self._overwrite = overwrite
        self._commit_dir = f"files/{_uuid.uuid4().hex}"
        # partitioned table? split each task's output one-file-per-
        # partition-value so the commit's scanned stats are exact
        # degenerate bounds — streaming ingest into a date-partitioned
        # table stays manifest-prunable.  Driver-side lookup; absent
        # table (create) or unpartitioned → no splitting.
        try:
            versions = _list_versions(root)
            self._pcols = (
                list(
                    _read_manifest(root, versions[-1]).get("partition_cols")
                    or []
                )
                if versions
                else []
            )
        except Exception:
            self._pcols = []

    def _split_tables(self, table):
        """[(sub-table)] split by distinct partition tuple (pyarrow),
        or [table] when unpartitioned / too many distinct values."""
        import pyarrow.compute as pc

        pcols = [c for c in self._pcols if c in table.column_names]
        if not pcols or not len(table):
            return [table]
        distinct = table.select(pcols).group_by(pcols).aggregate([])
        n = distinct.num_rows
        if n <= 1 or n > self._MAX_PARTITION_SPLITS:
            return [table]
        out = []
        for i in range(n):
            mask = None
            for c in pcols:
                v = distinct.column(c)[i]
                m = (
                    pc.is_null(table.column(c))
                    if not v.is_valid
                    else pc.equal(table.column(c), v)
                )
                mask = m if mask is None else pc.and_(mask, m)
            out.append(table.filter(mask))
        return out

    def write(self, iterator):
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return _TTWriteMessage([])
        table = pa.Table.from_batches(batches)
        f, path = _fs_of(self._root)
        f.create_dir(f"{path}/{self._commit_dir}", recursive=True)
        rels = []
        for part in self._split_tables(table):
            if not len(part):
                continue
            rel = f"{self._commit_dir}/part-{_uuid.uuid4().hex[:12]}.parquet"
            with f.open_output_stream(f"{path}/{rel}") as out:
                pq.write_table(part, out)
            rels.append(rel)
        return _TTWriteMessage(rels)

    def _all_files(self, messages) -> list[str]:
        return [rel for m in messages if m is not None for rel in m.files]

    def commit(self, messages):
        files = self._all_files(messages)
        if not files:
            return  # all-empty write: no version (matches no-op DML)
        # Arrow-first, exactly like the stream writer's commit: Spark 4
        # runs the BATCH writer's commit in a detached Python runner
        # with no JVM gateway too, where the former
        # ``SparkSession.builder.getOrCreate()`` booted a whole PRIVATE
        # local JVM (~10-20 s on first write, measured r14, plus a
        # second resident JVM for the rest of the process).  The
        # Spark-free commit publishes an identical manifest; only what
        # it can't honor (non-local root, CHECK constraints, generated
        # columns, schema drift, exotic stats) falls back to a session.
        try:
            _commit_files_arrow(
                self._root,
                files,
                mode="overwrite" if self._overwrite else "append",
            )
            return
        except _ArrowCommitUnsupported:
            pass
        from pyspark.sql import SparkSession

        from astro_spark.operators.timetravel import tt_commit_files

        # the commit callback may run on a listener thread without an
        # ACTIVE session; the default session in this driver JVM is the
        # one running the write job
        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        tt_commit_files(
            spark,
            self._root,
            files,
            mode="overwrite" if self._overwrite else "append",
        )

    def abort(self, messages):
        f, path = _fs_of(self._root)
        try:  # best-effort: unpublished files are invisible anyway
            f.delete_dir(f"{path}/{self._commit_dir}")
        except Exception:
            pass


class _TTStreamWriter(DataSourceStreamWriter, _TTArrowWriter):
    """writeStream.format('versioned_parquet'): one ACID log commit per
    micro-batch — the format-string twin of
    ``load_file_stream_versioned``.  At-least-once under foreachBatch
    replay semantics; the manifest is the commit point.

    Spark runs a Python streaming sink's ``commit`` in a detached
    runner process (no JVM gateway), where ``getOrCreate`` would boot a
    whole fresh local JVM per stream (~7-9 s measured).  The commit is
    therefore Arrow-first (``_commit_files_arrow`` — identical manifest
    semantics, pure pyarrow/os), falling back to the session path only
    for what the Spark-free twin can't honor: non-local roots, tables
    with CHECK constraints (Spark SQL expressions), schema drift, or
    decimal stats."""

    def __init__(self, root: str, overwrite: bool, options: dict | None = None):
        _TTArrowWriter.__init__(self, root, overwrite)
        opts = options or {}
        try:
            self._inline_max = int(
                opts.get("inlinefilesmax", _INLINE_MAX_DEFAULT)
            )
        except (TypeError, ValueError):
            self._inline_max = _INLINE_MAX_DEFAULT

    def write(self, iterator):
        import uuid as _uuid

        # a fresh dir per task invocation: micro-batches must not share
        # commit dirs across retries
        self._commit_dir = f"files/{_uuid.uuid4().hex}"
        return _TTArrowWriter.write(self, iterator)

    def commit(self, messages, batchId: int):
        files = self._all_files(messages)
        if not files:
            return  # all-empty micro-batch: no version
        try:
            _commit_files_arrow(
                self._root,
                files,
                mode="overwrite" if self._overwrite else "append",
                inline_max=self._inline_max,
            )
        except _ArrowCommitUnsupported:
            _TTArrowWriter.commit(self, messages)

    def abort(self, messages, batchId: int):
        _TTArrowWriter.abort(self, messages)


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

    def writer(self, schema: StructType, overwrite: bool) -> _TTArrowWriter:
        return _TTArrowWriter(self._root(), overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> _TTStreamWriter:
        return _TTStreamWriter(self._root(), overwrite, dict(self.options))

    def streamReader(self, schema: StructType) -> _TTStreamReader:
        return self._reader_with(schema, _TTStreamReader)

    def _reader_with(self, schema: StructType, cls):
        return cls(self._root(), schema, dict(self.options))


def register(spark) -> None:
    """Register the format with a session:
    ``spark.read.format('versioned_parquet')`` afterwards.  Also
    enables ``spark.sql.python.filterPushdown.enabled`` — the reader
    implements ``pushFilters`` (stats-based file pruning), and Spark
    4.1 REFUSES to run a pushFilters-bearing reader with the conf off
    rather than silently skipping pushdown."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VersionedParquetDataSource)
