"""Versioned parquet tables: time travel, RESTORE, history, VACUUM,
and optimistic concurrent-writer isolation — on plain parquet.

Reference parity: the reference's Databricks backend gets all of this
implicitly by CTAS-ing ``USING DELTA`` (``databases/databricks/
delta.py:168-187``) and letting the Delta log provide versions.  This
engine runs on catalogs without Delta (delta-spark is uninstallable in
this environment — COVERAGE.md), so the log protocol is re-expressed
minimally on any Hadoop filesystem:

Layout::

    <root>/
      _log/v00000000.json          # {"files": [...], "op", "ts", "schema"}
      _log/v00000001.json          # or {"base": ckpt, "add": [...], "remove": [...]}
      _log/ckpt-<uuid>.parquet     # checkpoint: complete (file, stats) snapshot
      files/<commit-uuid>/part-*.parquet   # immutable data files

Every commit writes its NEW data files under a fresh ``files/<uuid>/``
directory (existing files are never touched — writers never conflict on
data), then publishes a manifest resolving to the version's COMPLETE
file list.  Readers resolve a version to its manifest and read exactly
those files; data files with no manifest pointing at them are invisible
(a crashed writer leaves garbage, never corruption — ``vacuum`` reclaims
it).

**Checkpointed log (Delta's checkpoint model):** small tables keep the
complete file list INLINE in the JSON manifest.  Once a version's file
count exceeds ``spark.astro.tt.inlineFilesMax`` (default 1000), the
snapshot moves into a parquet CHECKPOINT (one (file, stats) row per
data file, written driver-side via Arrow — no Spark job) and manifests
carry only ``base`` (the checkpoint ref) plus inline ``add``/``remove``
deltas.  When the delta tail itself outgrows the knob, the commit
compacts: resolves the full list and writes a fresh checkpoint.  So on
a long-lived 100 TB table (10⁵–10⁶ files, thousands of commits) an
append costs O(new files) JSON, a read costs one tiny JSON + one
columnar checkpoint scan, and ``tt_history`` never parses a file list
at all (``n_files`` rides in every manifest header).

Concurrent-writer isolation is optimistic, Delta-style: the manifest is
created with ``FileSystem.create(path, overwrite=False)`` — atomic
put-if-absent on HDFS/local (object stores without atomic create need
an external lock; same caveat Delta's S3 single-writer LogStore
documents).  Two writers racing to commit version N: one wins, the
loser gets ``ConcurrentWriteError`` and retries against the new state
(``tt_append`` auto-retries — its file list is state-independent;
delete/update/merge/OPTIMIZE-WHERE rebase with file-level conflict
resolution via ``_publish_cow`` — Delta's WriteSerializable: writers
on disjoint partitions both land, same-partition rewrites conflict;
``tt_overwrite``/``tt_restore`` surface the conflict, because what they
mean to replace has changed).

Scale: a manifest is O(files-in-version) JSON read once per query
plan — the same cost profile as Delta's checkpointed log.  Reads pass
the explicit file list to the parquet source, so partition pruning,
predicate pushdown and column pruning all apply unchanged.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col as F_col

from ..exceptions import AstroSparkError


class ConcurrentWriteError(AstroSparkError):
    """Another writer committed the version this writer raced for."""


class ConstraintViolationError(AstroSparkError):
    """A write carried rows that fail a table CHECK constraint."""


_LOG = "_log"
_PAD = 8


def _named_root(spark: SparkSession, root: str) -> str:
    """Resolve a tt_register'd name to its versioned root; path-shaped
    strings (any separator) pass through untouched, so the whole
    Python tt_* surface accepts ``db.table`` exactly like the SQL
    front door."""
    if isinstance(root, str) and "/" not in root and "\\" not in root:
        resolved = tt_resolve_name(spark, root)
        if resolved is not None:
            return resolved
    return root


def _fs(spark: SparkSession, root: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    p = HPath(root)
    return HPath, p, p.getFileSystem(hconf)


def _manifest_name(version: int) -> str:
    return f"v{version:0{_PAD}d}.json"


def _is_external(entry: str) -> bool:
    """Manifest file entries are root-relative (``files/<uuid>/...``)
    EXCEPT for shallow-clone references, which are absolute paths/URIs
    into another table's root.  External entries are readable but never
    vacuum-deleted (they belong to the source table)."""
    return entry.startswith("/") or "://" in entry


def _abs(root: str, entry: str) -> str:
    return entry if _is_external(entry) else f"{root.rstrip('/')}/{entry}"


def _list_versions(fs, HPath, root: str) -> list[int]:
    log = HPath(f"{root}/{_LOG}")
    if not fs.exists(log):
        return []
    out = []
    for st in fs.listStatus(log):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(spark: SparkSession, fs, HPath, root: str, version: int) -> dict:
    path = HPath(f"{root}/{_LOG}/{_manifest_name(version)}")
    stream = fs.open(path)
    try:
        txt = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(txt)


def _publish(
    spark: SparkSession,
    fs,
    HPath,
    root: str,
    version: int,
    manifest: dict,
) -> None:
    """Atomic put-if-absent of the version manifest — the commit point.

    The manifest must appear atomically WITH its content (r14): the
    former create(overwrite=False)-then-write claimed the slot
    atomically but exposed a zero-length file to concurrent readers
    until the JSON landed (a racing reader got JSONDecodeError — the
    linearizability property test caught it), and a writer crash inside
    the window would wedge the slot with an empty manifest.  Local
    roots write a hidden temp file and ``os.link`` it into place
    (link(2) fails EEXIST atomically; content is complete from the
    first visible instant — same local/NFS scope as before).  Remote
    filesystems write a temp and ``fs.rename`` (HDFS rename is atomic
    and refuses an existing destination); object stores without atomic
    rename need a coordination service, exactly Delta's contract."""
    import os as _os
    import uuid as _uuid

    payload = json.dumps(manifest).encode("utf-8")
    name = _manifest_name(version)
    local = "://" not in root or root.startswith("file:")
    if local:
        lroot = root[5:] if root.startswith("file:") else root
        lroot = lroot if lroot.startswith("/") else "/" + lroot
        ldir = f"{lroot.rstrip('/')}/{_LOG}"
        _os.makedirs(ldir, exist_ok=True)
        tmp = f"{ldir}/.{name}.tmp-{_uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(payload)
        try:
            _os.link(tmp, f"{ldir}/{name}")
        except FileExistsError as exc:
            raise ConcurrentWriteError(
                f"version {version} was committed by another writer"
            ) from exc
        except OSError:
            # Mounts without hard-link support (SMB/FAT/some FUSE) raise
            # EPERM/ENOTSUP from link(2) (ADVICE r14): fall back to the
            # old O_CREAT|O_EXCL open — the empty-file exposure window
            # is the prior status quo on exactly those filesystems.
            try:
                fd = _os.open(
                    f"{ldir}/{name}", _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY
                )
            except FileExistsError as exc:
                raise ConcurrentWriteError(
                    f"version {version} was committed by another writer"
                ) from exc
            try:
                _os.write(fd, payload)
            finally:
                _os.close(fd)
        finally:
            try:
                _os.remove(tmp)
            except OSError:
                pass
        return
    log = HPath(f"{root}/{_LOG}")
    fs.mkdirs(log)
    tmp = HPath(f"{root}/{_LOG}/.{name}.tmp-{_uuid.uuid4().hex}")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(payload))
    finally:
        stream.close()
    try:
        renamed = fs.rename(tmp, HPath(f"{root}/{_LOG}/{name}"))
    except Exception as exc:
        fs.delete(tmp, False)
        raise ConcurrentWriteError(
            f"version {version} was committed by another writer"
        ) from exc
    if not renamed:
        fs.delete(tmp, False)
        raise ConcurrentWriteError(
            f"version {version} was committed by another writer"
        )


def _tt_meta_of(m: dict) -> tuple:
    """The table-metadata fields a rebased commit would silently
    clobber if an interleaved commit changed them — read through the
    NORMALIZED accessors (a v0 manifest stores stats_cols only
    implicitly in its inline stats; later commits materialize the
    header — a representation change, not a conflict) and compared as
    canonical JSON so dict ordering never fakes one either."""
    return (
        json.dumps(m.get("schema"), sort_keys=True),
        json.dumps(m.get("constraints") or {}, sort_keys=True),
        json.dumps(sorted(_stats_cols_of(m))),
        json.dumps(_partition_cols_of(m)),
        json.dumps(_generated_cols_of(m) or {}, sort_keys=True),
        json.dumps(m.get("properties") or {}, sort_keys=True),
    )


def _cow_extra(manifest: dict) -> dict:
    """Schema + carried metadata for a copy-on-write commit, from the
    snapshot the transaction read."""
    return {
        **(
            {"schema": manifest["schema"]}
            if manifest.get("schema") is not None
            else {}
        ),
        **_carry_constraints(manifest),
        **_carry_stats_cols(manifest),
        **_carry_partition(manifest),
        **_carry_generated(manifest),
        **_carry_props(manifest),
    }


def _publish_cow(
    spark: SparkSession,
    fs,
    HPath,
    root: str,
    head_v: int,
    manifest: dict,
    added: list[str],
    removed: list[str],
    added_stats: dict,
    op: str,
    extra: dict,
    max_retries: int = 10,
) -> int:
    """Commit a copy-on-write rewrite (delete/update/merge/OPTIMIZE
    WHERE) with Delta's WriteSerializable conflict resolution
    (reference semantics: the Databricks backend's MERGEs are
    serializable, ``databases/databricks/delta.py:357-442`` — Delta's
    default isolation resolves conflicts at FILE granularity).

    A lost ``_publish`` race does NOT automatically fail: the
    transaction REBASES onto the new head and retries, succeeding iff

    - no interleaved commit removed/rewrote any of THIS transaction's
      target files (``removed``) — since partitioned tables write
      partition-pure files, two writers scoped to disjoint partitions
      always pass this check (partition-level conflict resolution falls
      out of the file-level rule), while two writers rewriting the same
      partition conflict and the loser raises; and
    - no interleaved commit changed table metadata (schema,
      constraints, layout, generated columns, properties).

    Interleaved APPENDs always survive alongside this commit (their
    files carry over through the rebased ``_body_delta``) — allowed
    under WriteSerializable: the rewrite operates on its snapshot, the
    append's rows were never in scope."""
    base_meta = _tt_meta_of(manifest)
    for _ in range(max_retries):
        new_manifest = {
            **_body_delta(
                spark, fs, HPath, root, manifest, added, removed, added_stats
            ),
            "op": op,
            "ts": time.time(),
            **extra,
        }
        try:
            _publish(spark, fs, HPath, root, head_v + 1, new_manifest)
            return head_v + 1
        except ConcurrentWriteError:
            head_v, manifest = _head(spark, fs, HPath, root)
            if _tt_meta_of(manifest) != base_meta:
                raise ConcurrentWriteError(
                    f"{op} on {root}: a concurrent commit changed table "
                    "metadata (schema/constraints/layout/properties) — "
                    "re-run against the new snapshot"
                )
            live, _s = _resolve(spark, fs, HPath, root, manifest)
            live_set = set(live)
            gone = [f for f in removed if f not in live_set]
            if gone:
                raise ConcurrentWriteError(
                    f"{op} on {root}: a concurrent commit rewrote "
                    f"{len(gone)} of this transaction's target files "
                    f"(e.g. {gone[0]!r}) — overlapping partition/file "
                    "conflict; re-run against the new snapshot"
                )
    raise ConcurrentWriteError(
        f"{op} on {root} lost {max_retries} commit races"
    )


# Hive-style layout prefix for engine-written partitioned commits: the
# partition column is DUPLICATED into a `__p_<col>` path column before
# partitionBy, so the real column stays physically in the data files
# (reads remain plain explicit-file-list scans — no path inference, no
# mixed-depth basePath conflicts) while files still split one-partition-
# value-per-file, giving exact per-file [v, v] skipping bounds.
_PART_PREFIX = "__p_"


def _write_data_files(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    fs,
    HPath,
    partition_cols: list[str] | None = None,
) -> list[str]:
    """Write df's rows as immutable files under files/<uuid>/ and return
    their root-relative paths.  Nothing references them until a manifest
    is published, so a crash here leaves invisible garbage only.  With
    ``partition_cols`` the layout splits per partition value via
    ``__p_``-prefixed path columns (see ``_PART_PREFIX``)."""
    from pyspark.sql import functions as F

    commit_dir = f"files/{uuid.uuid4().hex}"
    writer = df.write.mode("overwrite")
    if partition_cols:
        missing = [c for c in partition_cols if c not in df.columns]
        if missing:
            raise AstroSparkError(
                f"write to a table partitioned by {partition_cols} is "
                f"missing partition column(s) {missing}"
            )
        writer = (
            df.select(
                "*",
                *[
                    F.col(c).alias(f"{_PART_PREFIX}{c}")
                    for c in partition_cols
                ],
            )
            .write.mode("overwrite")
            .partitionBy(*[f"{_PART_PREFIX}{c}" for c in partition_cols])
        )
    writer.parquet(f"{root}/{commit_dir}")
    out: list[str] = []

    def _walk(path, rel_prefix: str) -> None:
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if st.isDirectory():
                _walk(st.getPath(), f"{rel_prefix}{name}/")
            elif name.endswith(".parquet"):
                out.append(f"{rel_prefix}{name}")

    _walk(HPath(f"{root}/{commit_dir}"), f"{commit_dir}/")
    return sorted(out)


_STATS_TYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "string",
    "date", "timestamp", "timestamp_ntz",
)


def _json_safe_bound(v, side: int):
    """Manifest stats must survive ``json.dumps`` — Decimal bounds become
    floats, widened OUTWARD (``side`` -1 for a min, +1 for a max) when
    the nearest float would narrow the range, so file skipping stays
    sound: a widened range can only keep extra files, never drop one.
    date/timestamp bounds become their canonical strings ('2024-03-01',
    '2024-03-01 10:00:00' — space separator), which order
    lexicographically exactly like the values, so string predicate
    literals prune them directly."""
    import datetime as _dt
    import math
    from decimal import Decimal

    if isinstance(v, Decimal):
        f = float(v)
        if side < 0 and Decimal(f) > v:
            f = math.nextafter(f, -math.inf)
        elif side > 0 and Decimal(f) < v:
            f = math.nextafter(f, math.inf)
        return f
    if isinstance(v, (_dt.date, _dt.datetime)):
        return str(v)
    return v


def _file_stats(
    spark: SparkSession, root: str, files: list[str], stats_cols: list[str]
) -> dict:
    """Per-file [min, max] of each stats column — Delta's data-skipping
    stats, gathered with ONE column-pruned scan of the just-written
    files (group by input_file_name; map-side partial min/max)."""
    from pyspark.sql import functions as F

    if not files or not stats_cols:
        return {}
    df = spark.read.parquet(*[_abs(root, f) for f in files])
    for c in stats_cols:
        t = df.schema[c].dataType.simpleString()
        if t not in _STATS_TYPES and not t.startswith("decimal"):
            raise AstroSparkError(
                f"stats_cols: column {c!r} has type {t} — data-skipping "
                f"stats support numeric and string columns"
            )
    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    rows = (
        df.select(F.input_file_name().alias("__f"), *stats_cols)
        .groupBy("__f")
        .agg(*aggs)
        .collect()  # bounded: one row per file
    )

    def _norm(u: str) -> str:
        return u.removeprefix("file:").lstrip("/")

    by_norm = {_norm(_abs(root, f)): f for f in files}
    out: dict = {}
    for r in rows:
        rel = by_norm.get(_norm(r["__f"]))
        if rel is None:
            continue
        out[rel] = {
            c: [
                _json_safe_bound(r[f"__lo_{c}"], -1),
                _json_safe_bound(r[f"__hi_{c}"], +1),
            ]
            for c in stats_cols
        }
    return out


def _carry_stats(manifest: dict, files: list[str], new_stats: dict) -> dict:
    """Stats for a new manifest: carried-over files keep their recorded
    ranges, new files contribute theirs; files with no stats are simply
    absent (the reader keeps them — absence is never evidence)."""
    old = manifest.get("stats") or {}
    kept = {f: old[f] for f in files if f in old}
    kept.update(new_stats)
    return kept


def _inline_max(spark: SparkSession) -> int:
    """File-count threshold above which the snapshot moves from inline
    JSON into a parquet checkpoint — Delta's checkpoint cadence knob."""
    try:
        return int(spark.conf.get("spark.astro.tt.inlineFilesMax", "1000"))
    except Exception:  # pragma: no cover - exotic conf backend
        return 1000


def _write_checkpoint(
    spark: SparkSession, fs, HPath, root: str, files: list[str], stats: dict
) -> str:
    """Write the complete (file, stats) snapshot as a parquet checkpoint
    under _log/ and return its root-relative ref.  Driver-side Arrow —
    a log-maintenance write must not cost a Spark job.  The checkpoint
    is invisible until a manifest referencing it publishes."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    rel = f"{_LOG}/ckpt-{uuid.uuid4().hex}.parquet"
    table = pa.table(
        {
            "file": pa.array(files, type=pa.string()),
            "stats": pa.array(
                [json.dumps(stats[f]) if f in stats else None for f in files],
                type=pa.string(),
            ),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf)
    fs.mkdirs(HPath(f"{root}/{_LOG}"))
    stream = fs.create(HPath(f"{root}/{rel}"), False)
    try:
        stream.write(bytearray(buf.getvalue()))
    finally:
        stream.close()
    return rel


def _read_checkpoint(
    spark: SparkSession, fs, HPath, root: str, rel: str
) -> tuple[list[str], dict]:
    import io

    import pyarrow.parquet as pq

    stream = fs.open(HPath(f"{root}/{rel}"))
    try:
        data = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    t = pq.read_table(io.BytesIO(data))
    files = t.column("file").to_pylist()
    raw = t.column("stats").to_pylist()
    stats = {f: json.loads(s) for f, s in zip(files, raw) if s is not None}
    return files, stats


def _resolve(
    spark: SparkSession, fs, HPath, root: str, manifest: dict
) -> tuple[list[str], dict]:
    """(complete file list, per-file stats) of a manifest — inline form
    verbatim; checkpoint form = base snapshot minus ``remove`` plus
    ``add``.  One checkpoint read per plan, Delta's cost profile."""
    if "base" not in manifest:
        return manifest.get("files") or [], manifest.get("stats") or {}
    files, stats = _read_checkpoint(spark, fs, HPath, root, manifest["base"])
    rm = set(manifest.get("remove") or [])
    if rm:
        files = [f for f in files if f not in rm]
        stats = {f: s for f, s in stats.items() if f not in rm}
    files = files + (manifest.get("add") or [])
    stats.update(manifest.get("add_stats") or {})
    return files, stats


def _body_full(
    spark: SparkSession,
    fs,
    HPath,
    root: str,
    files: list[str],
    stats: dict,
) -> dict:
    """File-list body for a commit whose COMPLETE snapshot is known
    (create/overwrite/optimize, and compactions): inline while small,
    checkpoint ref beyond the knob."""
    if len(files) <= _inline_max(spark):
        body: dict = {"files": files, "n_files": len(files)}
        if stats:
            body["stats"] = stats
        return body
    ref = _write_checkpoint(spark, fs, HPath, root, files, stats)
    return {"base": ref, "add": [], "remove": [], "n_files": len(files)}


def _body_delta(
    spark: SparkSession,
    fs,
    HPath,
    root: str,
    prev: dict,
    added: list[str],
    removed: list[str],
    added_stats: dict,
) -> dict:
    """File-list body for an incremental commit (append/merge/delete):
    O(delta) JSON on a checkpointed table — prev's base carries over,
    the delta tail grows by this commit's add/remove — compacting into
    a fresh checkpoint only when the tail outgrows the knob."""
    rm = set(removed)
    if "base" in prev:
        prev_add = prev.get("add") or []
        add = [f for f in prev_add if f not in rm] + added
        prev_add_set = set(prev_add)
        remove = (prev.get("remove") or []) + [
            f for f in removed if f not in prev_add_set
        ]
        n_files = int(prev["n_files"]) - len(removed) + len(added)
        if len(add) + len(remove) <= _inline_max(spark):
            add_set = set(add)
            add_stats = {
                f: s
                for f, s in {**(prev.get("add_stats") or {}), **added_stats}.items()
                if f in add_set
            }
            body: dict = {
                "base": prev["base"],
                "add": add,
                "remove": remove,
                "n_files": n_files,
            }
            if add_stats:
                body["add_stats"] = add_stats
            return body
        files, stats = _resolve(spark, fs, HPath, root, prev)
        files = [f for f in files if f not in rm] + added
        stats = {f: s for f, s in stats.items() if f not in rm}
        stats.update(added_stats)
        return _body_full(spark, fs, HPath, root, files, stats)
    kept = [f for f in (prev.get("files") or []) if f not in rm]
    files = kept + added
    stats = _carry_stats(prev, kept, added_stats)
    return _body_full(spark, fs, HPath, root, files, stats)


def _copy_body(manifest: dict) -> dict:
    """The file-list body fields of an existing manifest, verbatim —
    checkpoint refs are immutable, so RESTORE and metadata-only commits
    may share them by reference."""
    return {
        k: manifest[k]
        for k in ("files", "stats", "base", "add", "remove", "add_stats", "n_files")
        if k in manifest
    }


def _schema_json(df: DataFrame) -> str:
    return json.dumps(df.schema.jsonValue())


def _evolved_schema(prev_json: str | None, df: DataFrame, merge_schema: bool) -> str:
    """The manifest schema a commit publishes — Delta's log-owned-schema
    model: the LOG, not parquet footer merging, is the source of truth.

    Without ``merge_schema`` a df carrying columns the table doesn't
    have is rejected (Delta's default); a df MISSING table columns is
    fine (they read back as NULL through the stored schema).  With
    ``merge_schema`` new columns append to the schema; a same-name
    type conflict raises."""
    from pyspark.sql.types import StructType

    if prev_json is None:
        return _schema_json(df)
    prev = StructType.fromJson(json.loads(prev_json))
    by_name = {f.name: f for f in prev.fields}
    new_fields = [f for f in df.schema.fields if f.name not in by_name]
    for f in df.schema.fields:
        if f.name in by_name and by_name[f.name].dataType != f.dataType:
            raise AstroSparkError(
                f"schema conflict on column {f.name!r}: table has "
                f"{by_name[f.name].dataType.simpleString()}, write has "
                f"{f.dataType.simpleString()}"
            )
    if new_fields and not merge_schema:
        raise AstroSparkError(
            f"write adds columns {[f.name for f in new_fields]} not in the "
            "table schema — pass merge_schema=True to evolve it"
        )
    return json.dumps(
        StructType(prev.fields + new_fields).jsonValue()
    )


class VersionedTable:
    """Target handle addressing a versioned-parquet root, accepted by
    batch ``load_file(..., output_table=)`` and
    ``run_transform(..., output_table=)`` — the reference's CTAS
    ``USING DELTA`` shape (``databases/databricks/delta.py:168-187``),
    where pointing an ELT op at a Delta table implicitly buys the log.
    ``stats_cols`` opt into per-file data-skipping stats on every
    commit; streaming's counterpart is ``load_file_stream_versioned``.
    """

    columns: tuple = ()  # no explicit-columns shorthand (Table has one)

    def __init__(
        self,
        root: str,
        stats_cols: list[str] | None = None,
        partition_by: list[str] | None = None,
    ):
        self.root = root
        self.stats_cols = stats_cols
        self.partition_by = partition_by

    def __repr__(self) -> str:  # pragma: no cover - debugging nicety
        return f"VersionedTable(root={self.root!r})"


def save_dataframe_versioned(
    spark: SparkSession,
    df: DataFrame,
    target: VersionedTable,
    if_exists: str = "replace",
) -> int:
    """Commit ``df`` to a versioned root with load_file's ``if_exists``
    vocabulary: absent root → version 0 (``tt_create``); ``replace`` →
    ``tt_overwrite`` (a NEW version — old versions stay readable, which
    is exactly what replacing a Delta table does); ``append`` →
    ``tt_append``.  Returns the committed version."""
    if if_exists not in ("replace", "append"):
        raise ValueError(f"invalid if_exists: {if_exists!r}")
    HPath, _p, fs = _fs(spark, target.root)
    if not _list_versions(fs, HPath, target.root):
        return tt_create(
            spark,
            df,
            target.root,
            stats_cols=target.stats_cols,
            partition_by=getattr(target, "partition_by", None),
        )
    if if_exists == "append":
        return tt_append(spark, df, target.root)
    return tt_overwrite(spark, df, target.root)


def tt_create(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    stats_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
    generated_cols: dict[str, str] | None = None,
) -> int:
    """Create a versioned table at ``root`` as version 0.

    ``stats_cols``: record per-file [min, max] of these columns in the
    manifest (Delta's data-skipping stats — one extra column-pruned
    scan per commit); ``tt_read(skip_by=...)`` then prunes files from
    the MANIFEST, before any footer is touched.  Later commits keep
    recording stats for the same columns automatically.

    ``partition_by``: Delta's ``PARTITIONED BY`` — every commit's files
    split one-partition-value-per-file (Hive-style ``__p_<col>=``
    layout that KEEPS the column in the data), and the partition
    columns automatically join the skipping stats, so
    ``tt_read(where="dt = ...")`` prunes to the partition's files from
    the manifest alone.

    ``generated_cols``: ``{name: spark-sql-expr}`` — Delta's
    ``GENERATED ALWAYS AS``: every write derives missing generated
    columns automatically (the time-partitioned-ingest pattern:
    ``partition_by=["day"], generated_cols={"day":
    "CAST(date_trunc('DAY', ts) AS DATE)"}`` — appends only carry
    ``ts``); a write that SUPPLIES the column must satisfy the
    expression or fails before publishing."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    if _list_versions(fs, HPath, root):
        raise AstroSparkError(f"versioned table already exists at {root}")
    partition_by = list(partition_by or [])
    header = {
        **({"stats_cols": list(stats_cols)} if stats_cols else {}),
        **({"partition_cols": partition_by} if partition_by else {}),
        **(
            {"generated_cols": dict(generated_cols)}
            if generated_cols
            else {}
        ),
    }
    df = _apply_generated(df, header)
    _check_generated(df, header, "create")
    for c in partition_by:
        if c not in df.columns:
            raise AstroSparkError(
                f"partition_by column {c!r} not in the DataFrame"
            )
    files = _write_data_files(
        spark, df, root, fs, HPath, partition_cols=partition_by
    )
    stats = _new_file_stats(
        spark, root, files, header, df
    ) if (stats_cols or partition_by) else {}
    manifest = {
        **_body_full(spark, fs, HPath, root, files, stats),
        "op": "create",
        "ts": time.time(),
        "schema": _schema_json(df),
        **header,
    }
    _publish(spark, fs, HPath, root, 0, manifest)
    return 0


def _check_constraints(df: DataFrame, manifest: dict, what: str) -> None:
    """Enforce the table's CHECK constraints on a write's rows BEFORE
    its manifest publishes (the data files are still invisible, so a
    rejected write leaves garbage, never a bad version).  Delta
    semantics: the expression must be TRUE for every row — FALSE and
    NULL both violate."""
    from pyspark.sql import functions as F

    for name, expr in (manifest.get("constraints") or {}).items():
        bad = df.where(~F.expr(expr).eqNullSafe(F.lit(True))).limit(1).count()
        if bad:
            raise ConstraintViolationError(
                f"{what} violates CHECK constraint {name!r}: ({expr}) "
                "is not TRUE for every written row"
            )


def _carry_constraints(manifest: dict) -> dict:
    c = manifest.get("constraints")
    return {"constraints": c} if c else {}


def _carry_props(manifest: dict) -> dict:
    p = manifest.get("properties")
    return {"properties": p} if p else {}


def tt_add_constraint(
    spark: SparkSession, root: str, name: str, expr: str
) -> int:
    """Delta ``ALTER TABLE ... ADD CONSTRAINT <name> CHECK (<expr>)``:
    validates the CURRENT head data first (Delta does the same scan),
    then commits a metadata-only version carrying the constraint —
    every later append/merge/overwrite must satisfy it or fails before
    publishing."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    if name in (manifest.get("constraints") or {}):
        raise AstroSparkError(f"constraint {name!r} already exists")
    trial = {**manifest, "constraints": {name: expr}}
    _check_constraints(_read_files(spark, root, manifest), trial, "existing data")
    new_manifest = {
        **manifest,
        "op": f"add_constraint({name})",
        "ts": time.time(),
        "constraints": {**(manifest.get("constraints") or {}), name: expr},
    }
    _publish(spark, fs, HPath, root, head_v + 1, new_manifest)
    return head_v + 1


def tt_drop_constraint(spark: SparkSession, root: str, name: str) -> int:
    """Delta ``ALTER TABLE ... DROP CONSTRAINT``: metadata-only commit."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    cons = dict(manifest.get("constraints") or {})
    if name not in cons:
        raise AstroSparkError(f"constraint {name!r} does not exist")
    del cons[name]
    new_manifest = {
        **manifest,
        "op": f"drop_constraint({name})",
        "ts": time.time(),
    }
    new_manifest.pop("constraints", None)
    if cons:
        new_manifest["constraints"] = cons
    _publish(spark, fs, HPath, root, head_v + 1, new_manifest)
    return head_v + 1


def tt_add_columns(
    spark: SparkSession, root: str, columns: list[tuple[str, str]]
) -> int:
    """Delta ``ALTER TABLE ... ADD COLUMNS (c TYPE, ...)``: metadata-only
    commit appending nullable columns to the LOG-owned schema — zero
    data files touched; every existing file reads the new columns as
    NULL (the same contract as ``tt_append(merge_schema=True)``, minus
    the write).  Duplicate names (case-insensitive, Spark's resolution)
    raise."""
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.types import _parse_datatype_string

    root = _named_root(spark, root)
    if not columns:
        raise ValueError("tt_add_columns: no columns given")
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    if manifest.get("schema") is None:
        raise AstroSparkError(
            "tt_add_columns: pre-schema-log table — commit a write "
            "first so the log owns a schema"
        )
    prev = StructType.fromJson(json.loads(manifest["schema"]))
    have = {f.name.lower() for f in prev.fields}
    new_fields = []
    for name, type_str in columns:
        if name.lower() in have:
            raise AstroSparkError(
                f"tt_add_columns: column {name!r} already exists"
            )
        have.add(name.lower())
        new_fields.append(
            StructField(name, _parse_datatype_string(type_str), True)
        )
    new_manifest = {
        **manifest,
        "op": f"add_columns({','.join(n for n, _t in columns)})",
        "ts": time.time(),
        "schema": json.dumps(
            StructType(prev.fields + new_fields).jsonValue()
        ),
    }
    _publish(spark, fs, HPath, root, head_v + 1, new_manifest)
    return head_v + 1


def tt_set_properties(
    spark: SparkSession, root: str, props: dict[str, str]
) -> int:
    """Delta ``ALTER TABLE ... SET TBLPROPERTIES``: merge ``props`` into
    the table's property map with a metadata-only commit (no data files
    touched); properties carry across every later commit and RESTORE
    restores the version's map."""
    root = _named_root(spark, root)
    if not props:
        raise ValueError("tt_set_properties: empty property map")
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    merged = {**(manifest.get("properties") or {})}
    merged.update({str(k): str(v) for k, v in props.items()})
    new_manifest = {
        **manifest,
        "op": "set_properties",
        "ts": time.time(),
        "properties": merged,
    }
    _publish(spark, fs, HPath, root, head_v + 1, new_manifest)
    return head_v + 1


def tt_unset_properties(
    spark: SparkSession, root: str, keys: list[str]
) -> int:
    """Delta ``ALTER TABLE ... UNSET TBLPROPERTIES``: metadata-only
    commit dropping the keys (missing keys are ignored, Delta's IF
    EXISTS behavior)."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    props = {
        k: v
        for k, v in (manifest.get("properties") or {}).items()
        if k not in set(keys)
    }
    new_manifest = {
        **manifest,
        "op": "unset_properties",
        "ts": time.time(),
    }
    new_manifest.pop("properties", None)
    if props:
        new_manifest["properties"] = props
    _publish(spark, fs, HPath, root, head_v + 1, new_manifest)
    return head_v + 1


def tt_properties(spark: SparkSession, root: str) -> dict[str, str]:
    """The head version's table-property map (empty if none set)."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    _v, manifest = _head(spark, fs, HPath, root)
    return dict(manifest.get("properties") or {})


def _stats_cols_of(manifest: dict) -> list[str]:
    """The column set this table records skipping stats for — the
    ``stats_cols`` header when present (checkpointed logs never need a
    file-list read to learn it), else inferred from inline stats for
    pre-header manifests."""
    cols = manifest.get("stats_cols")
    if cols:
        return list(cols)
    old = manifest.get("stats") or {}
    return sorted({c for st in old.values() for c in st})


def _carry_stats_cols(manifest: dict) -> dict:
    cols = _stats_cols_of(manifest)
    return {"stats_cols": cols} if cols else {}


def _partition_cols_of(manifest: dict) -> list[str]:
    """The table's partition columns (empty for unpartitioned tables).
    Partition values are first-class data everywhere EXCEPT adopted
    (``tt_convert``) Hive files, where they live only in paths."""
    return list(manifest.get("partition_cols") or [])


def _carry_partition(manifest: dict) -> dict:
    p = manifest.get("partition_cols")
    return {"partition_cols": list(p)} if p else {}


def _typed_partition_value(raw: str):
    """A Hive path value parsed the way Spark's partition inference
    would for the common types (int, float, else string); the Hive
    null sentinel yields None (no skipping bound — absence is never
    evidence)."""
    from urllib.parse import unquote

    v = unquote(raw)
    if v == "__HIVE_DEFAULT_PARTITION__":
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def _partition_values(rel: str, partition_cols: list[str]) -> dict:
    """{col: typed value} parsed from a file's ``key=value`` (adopted
    Hive layout) or ``__p_key=value`` (engine layout) path segments."""
    pset = set(partition_cols)
    out: dict = {}
    for seg in rel.split("/")[:-1]:
        k, sep, v = seg.partition("=")
        if not sep:
            continue
        if k.startswith(_PART_PREFIX):
            k = k[len(_PART_PREFIX):]
        if k in pset:
            out[k] = _typed_partition_value(v)
    return out


def _partition_path_stats(files: list[str], partition_cols: list[str]) -> dict:
    """Degenerate per-file [v, v] skipping bounds from path segments —
    a partition value IS a min==max range, so ``tt_read(where=)`` and
    ``skip_by`` prune partitions through the ordinary stats machinery
    with zero extra scans."""
    out: dict = {}
    for f in files:
        vals = _partition_values(f, partition_cols)
        entry = {c: [v, v] for c, v in vals.items() if v is not None}
        if entry:
            out[f] = entry
    return out


def _path_valued(rel: str, partition_cols: list[str]) -> bool:
    """True when this file's partition values exist ONLY in its path —
    an adopted Hive file (raw ``<col>=`` segment).  Engine-written
    files use ``__p_``-prefixed segments and keep the columns in the
    data, so they read through the ordinary explicit-file-list scan."""
    if _is_external(rel):
        return False
    pset = set(partition_cols)
    for seg in rel.split("/")[:-1]:
        k, sep, _v = seg.partition("=")
        if sep and k in pset:
            return True
    return False


def _generated_cols_of(manifest: dict) -> dict:
    """{col: spark-sql expr} of the table's GENERATED columns (Delta's
    ``GENERATED ALWAYS AS``) — typically the partition column of a
    time-partitioned table (``day = date_trunc('DAY', ts)``), so
    ingest never has to pre-derive it."""
    return dict(manifest.get("generated_cols") or {})


def _carry_generated(manifest: dict) -> dict:
    g = manifest.get("generated_cols")
    return {"generated_cols": dict(g)} if g else {}


def _require_generated_present(df: DataFrame, manifest: dict, what: str) -> None:
    """Pre-written files (format writes) cannot derive columns after
    the fact — a generated column missing from them would read back
    NULL and silently break the generation invariant, so refuse."""
    missing = [
        c for c in _generated_cols_of(manifest) if c not in df.columns
    ]
    if missing:
        raise AstroSparkError(
            f"{what}: files are missing GENERATED column(s) {missing} — "
            "format writes must carry them (the tt_append path derives "
            "them automatically)"
        )


def _apply_generated(df: DataFrame, manifest: dict) -> DataFrame:
    """Derive any generated column a write's df is missing — Delta's
    write-side generation.  Columns the df DOES carry are validated
    against the expression later (``_check_generated``)."""
    from pyspark.sql import functions as F

    for name, expr in _generated_cols_of(manifest).items():
        if name not in df.columns:
            df = df.withColumn(name, F.expr(expr))
    return df


def _check_generated(df: DataFrame, manifest: dict, what: str) -> None:
    """A write that SUPPLIES a generated column must satisfy its
    expression on every row (Delta enforces the same) — checked on the
    still-invisible files, so a violation leaves garbage, never a bad
    version."""
    from pyspark.sql import functions as F

    for name, expr in _generated_cols_of(manifest).items():
        if name not in df.columns:
            continue
        bad = (
            df.where(~F.col(name).eqNullSafe(F.expr(expr)))
            .limit(1)
            .count()
        )
        if bad:
            raise ConstraintViolationError(
                f"{what} violates GENERATED column {name!r}: supplied "
                f"values differ from ({expr})"
            )


def _new_file_stats(
    spark: SparkSession,
    root: str,
    new_files: list[str],
    manifest: dict,
    df: DataFrame,
) -> dict:
    """Skipping stats for a commit's new files: the table's
    ``stats_cols`` plus (on partitioned tables) the partition columns —
    engine-written files carry partition values physically, so ONE
    column-pruned scan covers both; partition columns of types the
    stats machinery doesn't order (date, boolean, ...) are skipped
    quietly (no bounds → never pruned — sound)."""
    pcols = _partition_cols_of(manifest)
    want = list(_stats_cols_of(manifest))
    want += [c for c in pcols if c not in want]
    scan: list[str] = []
    for c in want:
        if c not in df.columns:
            continue
        t = df.schema[c].dataType.simpleString()
        if (
            c in pcols
            and t not in _STATS_TYPES
            and not t.startswith("decimal")
        ):
            continue  # auto-added partition col of an unorderable type
        scan.append(c)
    return _file_stats(spark, root, new_files, scan) if scan else {}


def tt_append(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    max_retries: int = 10,
    merge_schema: bool = False,
) -> int:
    """Commit a new version = previous files + df's files.  Append's
    intent is state-independent, so a lost race is retried against the
    fresh head (data files are written ONCE; only the manifest race
    re-runs).  ``merge_schema=True`` evolves the table schema with the
    df's new columns (old files read the new columns as NULL); without
    it, new columns are rejected — Delta's mergeSchema contract."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    versions = _list_versions(fs, HPath, root)
    if not versions:
        raise AstroSparkError(f"no versioned table at {root}")
    # partition columns are immutable table metadata (no ALTER): one
    # head read decides the write layout, the retry loop re-reads only
    # the racing file-list state
    head_m = _read_manifest(spark, fs, HPath, root, versions[-1])
    pcols = _partition_cols_of(head_m)
    df = _apply_generated(df, head_m)
    new_files = _write_data_files(
        spark, df, root, fs, HPath, partition_cols=pcols
    )
    for _ in range(max_retries):
        versions = _list_versions(fs, HPath, root)
        if not versions:
            raise AstroSparkError(f"no versioned table at {root}")
        head = versions[-1]
        prev = _read_manifest(spark, fs, HPath, root, head)
        evolved = _evolved_schema(prev.get("schema"), df, merge_schema)
        # validate the ACTUAL written rows (the tt_merge pattern), not the
        # caller's lazy df: a nondeterministic df (rand() sampling,
        # unordered limit) must never publish rows the check didn't see.
        # Reading the still-invisible files through the evolved schema
        # also means columns df omits are checked as the NULLs they will
        # read back as.
        written = _read_files(
            spark, root, {"files": new_files, "schema": evolved}
        )
        _check_constraints(written, prev, "append")
        _check_generated(written, prev, "append")
        # stats only for columns the new files actually carry — a df
        # legitimately missing table columns (they read back as NULL)
        # must not crash the stats scan; absent per-file stats are
        # already treated as "keep" by the skip_by reader
        new_stats = _new_file_stats(spark, root, new_files, prev, df)
        manifest = {
            **_body_delta(spark, fs, HPath, root, prev, new_files, [], new_stats),
            "op": "append",
            "ts": time.time(),
            "schema": evolved,
            **_carry_constraints(prev),
            **_carry_stats_cols(prev),
            **_carry_partition(prev),
            **_carry_generated(prev),
            **_carry_props(prev),
        }
        try:
            _publish(spark, fs, HPath, root, head + 1, manifest)
            return head + 1
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"append to {root} lost {max_retries} commit races"
    )


def tt_commit_files(
    spark: SparkSession,
    root: str,
    new_files: list[str],
    mode: str = "append",
    max_retries: int = 10,
) -> int:
    """Publish ALREADY-WRITTEN data files (root-relative paths under
    ``files/``) as a commit — the log-transaction half used by the
    ``versioned_parquet`` Data Source writer, whose executors wrote the
    parquet through Arrow.  Semantics match ``tt_append`` /
    ``tt_overwrite`` exactly (schema checked against the log, CHECK
    constraints validated on the read-back of the still-invisible
    files, skipping stats recorded, append retries lost races); on an
    absent table the commit CREATES version 0 with the files' footer
    schema."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"tt_commit_files: invalid mode {mode!r}")
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    if not new_files:
        raise ValueError("tt_commit_files: no files to commit")
    df = spark.read.parquet(*[_abs(root, f) for f in new_files])
    versions = _list_versions(fs, HPath, root)
    if not versions:
        manifest = {
            **_body_full(spark, fs, HPath, root, sorted(new_files), {}),
            "op": "create",
            "ts": time.time(),
            "schema": _schema_json(df),
        }
        _publish(spark, fs, HPath, root, 0, manifest)
        return 0
    if mode == "overwrite":
        prev = _read_manifest(spark, fs, HPath, root, versions[-1])
        _require_generated_present(df, prev, "tt_commit_files")
        _check_constraints(df, prev, "overwrite")
        _check_generated(df, prev, "overwrite")
        stats = _new_file_stats(spark, root, sorted(new_files), prev, df)
        manifest = {
            **_body_full(spark, fs, HPath, root, sorted(new_files), stats),
            "op": "overwrite",
            "ts": time.time(),
            "schema": _schema_json(df),
            **_carry_constraints(prev),
            **_carry_stats_cols(prev),
            **_carry_partition(prev),
            **_carry_generated(prev),
            **_carry_props(prev),
        }
        _publish(spark, fs, HPath, root, versions[-1] + 1, manifest)
        return versions[-1] + 1
    for _ in range(max_retries):
        versions = _list_versions(fs, HPath, root)
        head = versions[-1]
        prev = _read_manifest(spark, fs, HPath, root, head)
        _require_generated_present(df, prev, "tt_commit_files")
        evolved = _evolved_schema(prev.get("schema"), df, False)
        committed = _read_files(
            spark, root, {"files": sorted(new_files), "schema": evolved}
        )
        _check_constraints(committed, prev, "append")
        _check_generated(committed, prev, "append")
        new_stats = _new_file_stats(spark, root, sorted(new_files), prev, df)
        manifest = {
            **_body_delta(
                spark, fs, HPath, root, prev, sorted(new_files), [], new_stats
            ),
            "op": "append",
            "ts": time.time(),
            "schema": evolved,
            **_carry_constraints(prev),
            **_carry_stats_cols(prev),
            **_carry_partition(prev),
            **_carry_generated(prev),
            **_carry_props(prev),
        }
        try:
            _publish(spark, fs, HPath, root, head + 1, manifest)
            return head + 1
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"commit to {root} lost {max_retries} commit races"
    )


def tt_overwrite(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    partition_by: list[str] | None = None,
) -> int:
    """Commit a new version containing ONLY df's files (old versions
    stay readable).  A lost race raises — the state this overwrite
    meant to replace is gone.  ``partition_by=None`` carries the
    table's existing partition layout; a list (possibly empty) replaces
    it — Delta's ``CREATE OR REPLACE ... PARTITIONED BY`` re-layout."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    versions = _list_versions(fs, HPath, root)
    if not versions:
        raise AstroSparkError(f"no versioned table at {root}")
    prev = _read_manifest(spark, fs, HPath, root, versions[-1])
    pcols = (
        _partition_cols_of(prev) if partition_by is None else list(partition_by)
    )
    df = _apply_generated(df, prev)
    files = _write_data_files(spark, df, root, fs, HPath, partition_cols=pcols)
    # validate the ACTUAL written rows (tt_merge pattern) — the files are
    # still invisible, so a rejected overwrite leaves garbage, never a
    # bad version, even for a nondeterministic df
    written = _read_files(
        spark, root, {"files": files, "schema": _schema_json(df)}
    )
    _check_constraints(written, prev, "overwrite")
    _check_generated(written, prev, "overwrite")
    header = {
        **_carry_stats_cols(prev),
        **({"partition_cols": pcols} if pcols else {}),
        **_carry_generated(prev),
    }
    stats = _new_file_stats(spark, root, files, header, df)
    manifest = {
        **_body_full(spark, fs, HPath, root, files, stats),
        "op": "overwrite",
        "ts": time.time(),
        "schema": _schema_json(df),  # overwrite replaces the schema too
        **_carry_constraints(prev),
        **header,
        **_carry_props(prev),
    }
    _publish(spark, fs, HPath, root, versions[-1] + 1, manifest)
    return versions[-1] + 1


def _skip_bounds_from_predicate(where: str) -> dict:
    """Manifest skip bounds derivable from a predicate's TOP-LEVEL
    conjuncts — Delta's automatic data skipping for the sargable
    shapes (``col >= lit``, ``<=``, ``<``, ``>``, ``=``,
    ``col BETWEEN a AND b``; numeric or single-quoted string
    literals).  Anything else contributes no bounds (the caller still
    filters exactly); a top-level OR disables skipping entirely.
    Strict bounds widen to closed ones — widening only ever KEEPS
    extra files, so pruning stays sound."""
    import re

    out: dict[str, list] = {}

    def _tighten(col: str, lo, hi) -> None:
        cur = out.setdefault(col, [None, None])
        if lo is not None and (cur[0] is None or lo > cur[0]):
            cur[0] = lo
        if hi is not None and (cur[1] is None or hi < cur[1]):
            cur[1] = hi

    def _lit(txt: str):
        txt = txt.strip()
        if txt.startswith("'") and txt.endswith("'"):
            return txt[1:-1]
        try:
            return int(txt)
        except ValueError:
            return float(txt)  # may raise → conjunct ignored by caller

    # split on standalone AND at depth 0 outside quotes; a BETWEEN's
    # own AND binds tighter and must not split its conjunct
    def _word_at(low: str, i: int, w: str) -> bool:
        return (
            low.startswith(w, i)
            and (i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_"))
            and (
                i + len(w) >= len(low)
                or not (low[i + len(w)].isalnum() or low[i + len(w)] == "_")
            )
        )

    parts: list[str] = []
    depth, q, buf, i, low = 0, None, [], 0, where.lower()
    pending_between = False
    while i < len(where):
        ch = where[i]
        if q:
            if ch == q:
                q = None
            buf.append(ch)
            i += 1
            continue
        if ch in "'\"":
            q = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and _word_at(low, i, "or"):
            return {}  # a top-level OR: no conjunct is individually binding
        elif depth == 0 and _word_at(low, i, "between"):
            pending_between = True
        elif depth == 0 and _word_at(low, i, "and"):
            if pending_between:
                pending_between = False  # BETWEEN a AND b — keep together
            else:
                parts.append("".join(buf))
                buf = []
                i += 3
                continue
        buf.append(ch)
        i += 1
    parts.append("".join(buf))

    lit_re = r"(-?\d+(?:\.\d+)?|'[^']*')"
    cmp_re = re.compile(
        rf"(?is)^\s*`?(\w+)`?\s*(>=|<=|==|=|<|>)\s*{lit_re}\s*$"
    )
    btw_re = re.compile(
        rf"(?is)^\s*`?(\w+)`?\s+between\s+{lit_re}\s+and\s+{lit_re}\s*$"
    )
    in_re = re.compile(
        rf"(?is)^\s*`?(\w+)`?\s+in\s*\(\s*{lit_re}"
        rf"(?:\s*,\s*{lit_re})*\s*\)\s*$"
    )
    in_lit_re = re.compile(lit_re)
    for piece in parts:
        try:
            m = cmp_re.match(piece)
            if m:
                col, op, val = m.group(1), m.group(2), _lit(m.group(3))
                if op in (">=", ">"):
                    _tighten(col, val, None)
                elif op in ("<=", "<"):
                    _tighten(col, None, val)
                else:
                    _tighten(col, val, val)
                continue
            m = btw_re.match(piece)
            if m:
                _tighten(m.group(1), _lit(m.group(2)), _lit(m.group(3)))
                continue
            m = in_re.match(piece)
            if m:
                # col IN (a, b, c): [min, max] of the list — Delta
                # prunes IN lists the same way; mixed-type lists raise
                # on min/max and contribute nothing (sound)
                vals = [
                    _lit(t.group(0))
                    for t in in_lit_re.finditer(piece[piece.index("(") :])
                ]
                _tighten(m.group(1), min(vals), max(vals))
        except (ValueError, TypeError):
            continue  # unparseable literal: conjunct contributes nothing
    return {c: (lo, hi) for c, (lo, hi) in out.items()}


def _parse_temporal(s):
    """datetime for a canonical date/timestamp string, else None."""
    from datetime import datetime

    if not isinstance(s, str):
        return None
    try:
        return datetime.fromisoformat(s)
    except ValueError:
        return None


def _skip_provable(rng, lo, hi) -> bool:
    """True iff a file's recorded [rng] provably cannot intersect
    [lo, hi].  Temporal bounds (stats store date/timestamp ranges as
    their canonical strings) compare in TIME space — a lexicographic
    compare would mis-prune against shorter or non-canonical predicate
    literals ('2024-03-01' vs '2024-03-01 00:00:00'); a predicate
    literal that doesn't parse proves nothing on its side (the file is
    kept — sound)."""
    r0, r1 = rng[0], rng[1]
    t0, t1 = _parse_temporal(r0), _parse_temporal(r1)
    if t0 is not None and t1 is not None:
        # offset-aware vs naive datetimes (e.g. a manifest written by
        # an older Arrow commit that serialized '+00:00' bounds, read
        # against a naive predicate literal) raise TypeError on <:
        # proves nothing — keep the file (sound)
        try:
            if hi is not None:
                th = _parse_temporal(hi)
                if th is not None and t0 > th:
                    return True
            if lo is not None:
                tl = _parse_temporal(lo)
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
        # cross-type bound (e.g. a string literal against numeric
        # stats, where SQL would cast): can't prove skippable
        return False
    return False


def tt_read(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    as_of_ts: float | None = None,
    skip_by: dict | None = None,
    where: str | None = None,
) -> DataFrame:
    """Read a version (default: latest).  ``as_of_ts`` selects the
    latest version committed at or before that unix timestamp (Delta's
    ``TIMESTAMP AS OF``).  The explicit file list goes straight to the
    parquet source — pushdown and pruning apply unchanged.

    ``skip_by={col: (lo, hi)}`` prunes files whose RECORDED [min, max]
    (``stats_cols`` at commit time) cannot intersect [lo, hi] — Delta's
    data skipping, decided entirely from the manifest before any
    parquet footer is opened.  Either bound may be None (open end).
    Files without stats are always kept (absence is never evidence),
    and skipping is an OPTIMIZATION contract only: the caller still
    applies their own ``.where`` — rows outside the bounds may appear
    from kept files.

    ``where=`` is the AUTOMATIC form: the predicate is applied exactly
    (``.where``), and its top-level sargable conjuncts additionally
    derive manifest skip bounds (``_skip_bounds_from_predicate``) —
    Delta's stats-based skipping without hand-passing ``skip_by``.
    Explicit ``skip_by`` bounds intersect with the derived ones."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    versions = _list_versions(fs, HPath, root)
    if not versions:
        raise AstroSparkError(f"no versioned table at {root}")
    if version is not None and as_of_ts is not None:
        raise ValueError("tt_read: pass at most one of version / as_of_ts")
    if version is None and as_of_ts is None:
        version = versions[-1]
    elif as_of_ts is not None:
        eligible = [
            v
            for v in versions
            if _read_manifest(spark, fs, HPath, root, v)["ts"] <= as_of_ts
        ]
        if not eligible:
            raise AstroSparkError(
                f"no version at or before ts={as_of_ts} in {root}"
            )
        version = eligible[-1]
    if version not in versions:
        raise AstroSparkError(f"version {version} not found in {root}")
    manifest = _read_manifest(spark, fs, HPath, root, version)
    files, stats = _resolve(spark, fs, HPath, root, manifest)
    if where is not None:
        derived = _skip_bounds_from_predicate(where)
        merged = dict(skip_by or {})
        for col, (lo, hi) in derived.items():
            cur_lo, cur_hi = merged.get(col, (None, None))
            if lo is not None and (cur_lo is None or lo > cur_lo):
                cur_lo = lo
            if hi is not None and (cur_hi is None or hi < cur_hi):
                cur_hi = hi
            merged[col] = (cur_lo, cur_hi)
        skip_by = merged or None
    if skip_by:

        def _keep(f: str) -> bool:
            st = stats.get(f)
            if st is None:
                return True
            for col, (lo, hi) in skip_by.items():
                rng = st.get(col)
                if rng is None or rng[0] is None or rng[1] is None:
                    continue  # no/NULL-only stats: can't prove skippable
                if _skip_provable(rng, lo, hi):
                    return False
            return True

        files = [f for f in files if _keep(f)]

    def _finish(df: DataFrame) -> DataFrame:
        return df.where(where) if where is not None else df

    schema_json = manifest.get("schema")
    if not files and schema_json is None:
        raise AstroSparkError(
            f"version {version} of {root} has no data files "
            "(empty-write commit) — no schema to serve"
        )
    # the LOG owns the schema (Delta's model): files written before a
    # column existed read it as NULL — no footer merging, no ambiguity;
    # adopted Hive files additionally materialize partition columns
    # from their paths (_read_file_lists)
    return _finish(
        _read_file_lists(
            spark, root, files, schema_json, _partition_cols_of(manifest)
        )
    )


def tt_restore(spark: SparkSession, root: str, version: int) -> int:
    """RESTORE: commit a NEW head version whose file list equals the
    given version's (Delta ``RESTORE TABLE ... TO VERSION AS OF``) —
    history is preserved, nothing is deleted."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    versions = _list_versions(fs, HPath, root)
    if version not in versions:
        raise AstroSparkError(f"version {version} not found in {root}")
    src = _read_manifest(spark, fs, HPath, root, version)
    # the file-list body copies verbatim — checkpoint refs are immutable,
    # so restoring a checkpointed version shares its base by reference
    manifest = {
        **_copy_body(src),
        "op": f"restore(v{version})",
        "ts": time.time(),
    }
    if src.get("schema") is not None:
        manifest["schema"] = src["schema"]  # restore the schema too
    if src.get("constraints") is not None:
        manifest["constraints"] = src["constraints"]  # and the checks
    if src.get("stats_cols") is not None:
        manifest["stats_cols"] = src["stats_cols"]
    if src.get("partition_cols") is not None:
        manifest["partition_cols"] = src["partition_cols"]
    if src.get("generated_cols") is not None:
        manifest["generated_cols"] = src["generated_cols"]
    if src.get("properties") is not None:
        manifest["properties"] = src["properties"]
    _publish(spark, fs, HPath, root, versions[-1] + 1, manifest)
    return versions[-1] + 1


def tt_restore_to_ts(spark: SparkSession, root: str, as_of_ts: float) -> int:
    """RESTORE to the latest version committed at or before the given
    unix timestamp — Delta ``RESTORE TABLE ... TO TIMESTAMP AS OF``."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    eligible = [
        v
        for v in _list_versions(fs, HPath, root)
        if _read_manifest(spark, fs, HPath, root, v)["ts"] <= as_of_ts
    ]
    if not eligible:
        raise AstroSparkError(
            f"no version at or before ts={as_of_ts} in {root}"
        )
    return tt_restore(spark, root, eligible[-1])


def tt_convert(
    spark: SparkSession,
    root: str,
    partition_by: list[str] | None = None,
) -> int:
    """Delta ``CONVERT TO DELTA``: adopt an existing plain-parquet
    directory as a versioned table IN PLACE — version 0's manifest
    references the directory's parquet files by relative path, zero
    bytes rewritten.  Later commits behave normally (appends land under
    ``files/<uuid>/``, DML copies-on-write, vacuum may reclaim the
    adopted files once no live version references them).

    HIVE-PARTITIONED layouts (``key=value`` subdirs) are adopted too —
    Delta's ``CONVERT TO DELTA ... PARTITIONED BY``: the partition
    columns are detected from the paths (outer→inner dir order),
    recorded as the table's ``partition_cols``, and each adopted file
    gets degenerate [v, v] skipping bounds parsed from its path, so
    partition pruning works from the manifest with zero scans.
    Adopted files keep their values in PATHS (read through one
    ``basePath`` scan); every later rewrite migrates touched files to
    the engine layout, which carries the columns in the data.
    ``partition_by`` (column names; Delta's clause carries types — the
    path values type themselves here) is optional validation: when
    given it must match the detected layout.

    Refuses an already-versioned root, an empty directory, and a
    layout whose files disagree on the partition column set."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    if _list_versions(fs, HPath, root):
        raise AstroSparkError(
            f"tt_convert: {root} is already a versioned table"
        )
    files: list[str] = []

    def _walk(path, rel_prefix: str) -> None:
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if st.isDirectory():
                if name == _LOG:
                    continue
                _walk(st.getPath(), f"{rel_prefix}{name}/")
            elif name.endswith(".parquet"):
                files.append(f"{rel_prefix}{name}")

    if not fs.exists(HPath(root)):
        raise AstroSparkError(f"tt_convert: no such directory {root}")
    _walk(HPath(root), "")
    if not files:
        raise AstroSparkError(f"tt_convert: no parquet files under {root}")
    files = sorted(files)

    # detect the Hive layout: every file's FULL directory segment
    # sequence must be key=value dirs of equal depth — matching only
    # the key=value segments would let dt=1/f.parquet and
    # dt=1/extra/f.parquet agree on ('dt',) and then fail later inside
    # Spark's basePath partition inference with an opaque 'Conflicting
    # directory structures' error instead of this message
    hive = any("=" in s for f in files for s in f.split("/")[:-1])

    def _keys_of(rel: str) -> tuple[str, ...]:
        segs = rel.split("/")[:-1]
        if hive and not all("=" in s for s in segs):
            raise AstroSparkError(
                "tt_convert: non-partition directory in a Hive layout — "
                f"every directory segment must be key=value, got {rel!r}"
            )
        return tuple(s.partition("=")[0] for s in segs if "=" in s)

    layouts = {_keys_of(f) for f in files}
    if len(layouts) > 1:
        raise AstroSparkError(
            "tt_convert: inconsistent Hive layout — files disagree on "
            f"their partition columns or depth: {sorted(layouts)}"
        )
    pcols = list(layouts.pop())
    if partition_by is not None and list(partition_by) != pcols:
        raise AstroSparkError(
            f"tt_convert: PARTITIONED BY {list(partition_by)} does not "
            f"match the directory layout {pcols}"
        )
    # a fresh estate's dirs are always fully covered, so the adoption
    # scan collapses to O(partition dirs) paths — at 100k files this is
    # the difference between a ~3 s and a ~3 min convert (the same
    # explicit-path plan tax _read_file_lists compacts away)
    paths = (
        _compact_paths(spark, root, files)
        if len(files) >= _dir_compact_min(spark)
        else files
    )
    abs_files = [_abs(root, f) for f in paths]
    if pcols:
        # basePath materializes the partition columns (and their
        # inferred types) into the adopted schema
        df = spark.read.option("basePath", root).parquet(*abs_files)
    else:
        df = spark.read.parquet(*abs_files)
    stats = _partition_path_stats(files, pcols) if pcols else {}
    manifest = {
        **_body_full(spark, fs, HPath, root, files, stats),
        "op": "convert",
        "ts": time.time(),
        "schema": _schema_json(df),
        **({"partition_cols": pcols} if pcols else {}),
    }
    _publish(spark, fs, HPath, root, 0, manifest)
    return 0


def tt_detail(spark: SparkSession, root: str) -> DataFrame:
    """Delta ``DESCRIBE DETAIL``: one row describing the CURRENT
    snapshot — format, location, head version, file count, total data
    bytes, commit timestamp, and the constraint/stats-column metadata.
    File sizes come from the filesystem (the manifest deliberately
    stores no sizes — Delta's detail pays the same listing); local
    roots stat through os.stat (100k files ≈ 0.3 s), remote ones pay
    one getFileStatus per file through the gateway (the round-14
    stress run measured that loop at ~0.37 ms/file — fine at 10³
    files, 37 s at 10⁵; a remote 10⁵-file table should read
    ``num_files`` from tt_history's free header instead)."""
    import os as _os

    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    files, _stats = _resolve(spark, fs, HPath, root, manifest)
    size = 0
    local = "://" not in root or root.startswith("file:")
    for f in files:
        ab = _abs(root, f)
        if local:
            p = ab[5:].lstrip("/") if ab.startswith("file:") else ab
            p = p if p.startswith("/") else "/" + p
            try:
                size += _os.stat(p).st_size
            except OSError:
                pass  # vacuumed/external path: counts zero, like exists()
        else:
            jp = HPath(ab)
            if fs.exists(jp):
                size += int(fs.getFileStatus(jp).getLen())
    return _literal_rows_df(
        spark,
        [
            (
                "versioned_parquet",
                root,
                int(head_v),
                len(files),
                size,
                float(manifest.get("ts") or 0.0),
                json.dumps(manifest.get("constraints") or {}),
                list(_stats_cols_of(manifest)),
                json.dumps(manifest.get("properties") or {}),
                list(_partition_cols_of(manifest)),
            )
        ],
        "format string, location string, version long, num_files long, "
        "size_bytes long, last_commit_ts double, constraints string, "
        "stats_cols array<string>, properties string, "
        "partition_cols array<string>",
    )


def _literal_rows_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Tiny driver-side literal relation as a ``Project(Range(n))`` of
    pure JVM literals (arrays indexed by the range id for n > 1).

    ``spark.createDataFrame(small_list)`` parallelizes into
    defaultParallelism (32) pickled slices, and EVERY action over the
    frame pays a Python-worker round trip per slice (~0.7 s per count
    measured r14; a coalesce(1) makes it worse — 5.5 s — by evaluating
    all 32 slices sequentially in one task).  The literal projection
    plans as Range(n) + literals: ~0.25 s per count, zero Python, and
    the row count is statically visible to plan audits (the
    ``_one_row`` property, VERDICT r11 #2).  Command results and log
    metadata (history/detail) are bounded-size by construction — never
    use this for data-sized relations."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    from pyspark.sql.types import ArrayType, MapType, StructType

    st = _parse_datatype_string(schema)
    if not rows:
        return spark.createDataFrame([], st)

    def _lit(v, dt):
        if isinstance(v, (list, tuple)) and not v:
            return F.array().cast(dt)  # F.lit([]) cannot infer a type
        return F.lit(v).cast(dt)

    if len(rows) == 1:
        return spark.range(1).select(
            *[
                _lit(v, f.dataType).alias(f.name)
                for v, f in zip(tuple(rows[0]), st.fields)
            ]
        )
    if any(
        isinstance(f.dataType, (ArrayType, MapType, StructType))
        for f in st.fields
    ):
        return spark.createDataFrame(rows, st)  # nested literals: punt
    idx = (F.col("id") + 1).cast("int")
    return spark.range(len(rows)).select(
        *[
            F.element_at(F.lit([tuple(r)[i] for r in rows]), idx)
            .cast(f.dataType)
            .alias(f.name)
            for i, f in enumerate(st.fields)
        ]
    )


def tt_history(spark: SparkSession, root: str) -> DataFrame:
    """(version, op, ts, n_files) per committed version — Delta
    ``DESCRIBE HISTORY``."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    rows = [
        (
            v,
            (m := _read_manifest(spark, fs, HPath, root, v))["op"],
            float(m["ts"]),
            # header-only: n_files rides in every manifest, so history
            # never parses (or fetches) a file list — O(versions) tiny
            # JSON reads even on a checkpointed million-file table
            int(m.get("n_files", len(m.get("files") or []))),
        )
        for v in _list_versions(fs, HPath, root)
    ]
    return _literal_rows_df(
        spark, rows, "version long, op string, ts double, n_files long"
    )


def _dir_compact_min(spark: SparkSession) -> int:
    try:
        return int(spark.conf.get("spark.astro.tt.dirCompactMin", "256"))
    except Exception:
        return 256


def _compact_paths(
    spark: SparkSession, root: str, rel_files: list[str]
) -> list[str]:
    """Collapse an explicit file list to parent DIRECTORIES wherever the
    directory's visible parquet set exactly equals the selected subset
    (round 14, found by tools/tt_partition_sweep.py): handing Spark's
    source N explicit paths costs ~1.8 ms/path in py4j marshaling +
    driver-side listing — 72 s of PLAN time at 40k files, ~30 min at
    10⁶ — while handing it the parent dirs costs O(dirs) and lets the
    JVM list children in bulk.  Commit dirs (``files/<uuid>/...``) are
    immutable and either fully live or partially removed, so on a
    churn-free table this collapses 10⁵ paths into 10²-10³ dirs; a dir
    that lost ANY member to copy-on-write (or contains extras) falls
    back to its explicit files — never a wrong row, only a slower plan.
    One listStatus per candidate dir decides it.  Only LEAF dirs are
    collapsed (the file's immediate parent), so Spark never discovers
    partition key=value segments BELOW a passed path (its default
    basePath is the dir itself); callers that want path-derived
    partition columns pass ``basePath`` explicitly and get the same
    inference for dirs as for files."""
    import os as _os
    from collections import defaultdict

    by_dir: dict[str, list[str]] = defaultdict(list)
    for f in rel_files:
        d = f.rsplit("/", 1)[0] if "/" in f else ""
        by_dir[d].append(f)

    def _local(p: str) -> str | None:
        # local paths list via ONE os.listdir syscall — the py4j loop
        # over FileStatus objects costs 2 round-trips per FILE (18 s at
        # 40k files, measured), defeating the point of compaction
        if "://" not in p:
            return p
        if p.startswith("file:"):
            rest = p[5:]
            while rest.startswith("//"):
                rest = rest[1:]
            return rest if rest.startswith("/") else "/" + rest
        return None

    fs_tuple = None  # lazily opened only if a non-local dir appears
    out: list[str] = []
    for d, members in by_dir.items():
        if not d or len(members) < 2:
            out.extend(members)
            continue
        ab = _abs(root, d)
        loc = _local(ab)
        try:
            if loc is not None:
                listed = _os.listdir(loc)
            else:
                if fs_tuple is None:
                    fs_tuple = _fs(spark, root)
                HPath, _p, fs = fs_tuple
                listed = [
                    st.getPath().getName()
                    for st in fs.listStatus(HPath(ab))
                    if not st.isDirectory()
                ]
        except Exception:
            out.extend(members)
            continue
        # hidden files (_SUCCESS, .crc) are invisible to Spark's file
        # index — ignore them; any OTHER extra or missing visible entry
        # disqualifies the dir
        visible = {n for n in listed if not n.startswith(("_", "."))}
        names = {m.rsplit("/", 1)[-1] for m in members}
        if visible == names:
            out.append(d)
        else:
            out.extend(members)
    return out


def _read_file_lists(
    spark: SparkSession,
    root: str,
    files: list[str],
    schema_json: str | None,
    partition_cols: list[str],
) -> DataFrame:
    """The engine's file-list scan, partition-aware: engine-written
    files (partition values physically in the data) go to the ordinary
    explicit-file-list parquet source; adopted Hive files (values only
    in ``key=value`` paths) go through ONE uniform-depth
    ``basePath=root`` scan so Spark materializes the partition columns
    from the paths; both sides read the LOG's schema and union.  Steady
    state after churn is a single plain scan — every rewrite moves
    files to the engine layout.

    Above ``spark.astro.tt.dirCompactMin`` files (default 256) the
    explicit lists collapse to fully-covered parent dirs first
    (``_compact_paths``) — the 10⁵-file plan-construction lever."""
    from pyspark.sql.types import StructType

    schema = (
        StructType.fromJson(json.loads(schema_json))
        if schema_json is not None
        else None
    )
    if not files:
        if schema is None:
            raise AstroSparkError("no data files and no schema to serve")
        return spark.createDataFrame([], schema)
    adopted = (
        [f for f in files if _path_valued(f, partition_cols)]
        if partition_cols
        else []
    )
    # hoist the set: building it per-element made this comprehension
    # O(files²) — 78 of the 82 plan-construction seconds at 40k files
    # (tools/tt_partition_sweep.py profile, round 14)
    adopted_set = set(adopted)
    plain = [f for f in files if f not in adopted_set]
    compact_min = _dir_compact_min(spark)
    parts: list[DataFrame] = []
    if plain:
        paths = (
            _compact_paths(spark, root, plain)
            if len(plain) >= compact_min
            else plain
        )
        r = spark.read if schema is None else spark.read.schema(schema)
        parts.append(r.parquet(*[_abs(root, f) for f in paths]))
    if adopted:
        paths = (
            _compact_paths(spark, root, adopted)
            if len(adopted) >= compact_min
            else adopted
        )
        r = spark.read.option("basePath", root)
        if schema is not None:
            r = r.schema(schema)
        parts.append(r.parquet(*[_abs(root, f) for f in paths]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_files(spark: SparkSession, root: str, manifest: dict) -> DataFrame:
    """Read a manifest's (resolved) file list through its stored schema
    (files written before a column existed read it as NULL).  Accepts
    both real manifests (inline or checkpointed) and synthetic
    ``{"files": [...]}`` dicts internal callers build (synthetic dicts
    for PARTITIONED tables must carry ``partition_cols`` so adopted
    files materialize their path values)."""
    if "base" in manifest:
        HPath, _p, fs = _fs(spark, root)
        files, _stats = _resolve(spark, fs, HPath, root, manifest)
    else:
        files = manifest.get("files") or []
    return _read_file_lists(
        spark,
        root,
        files,
        manifest.get("schema"),
        _partition_cols_of(manifest),
    )


def _head(spark: SparkSession, fs, HPath, root: str) -> tuple[int, dict]:
    versions = _list_versions(fs, HPath, root)
    if not versions:
        raise AstroSparkError(f"no versioned table at {root}")
    return versions[-1], _read_manifest(spark, fs, HPath, root, versions[-1])


def _touched_relative(
    spark: SparkSession, root: str, files: list[str], flagged: DataFrame
) -> list[str]:
    """Map a DISTINCT input_file_name() relation back to root-relative
    manifest paths.  Bounded collect: at most len(files) rows."""
    abs_by_rel = {f: _abs(root, f) for f in files}
    hit = {r[0] for r in flagged.limit(len(files) + 1).collect()}

    def _norm(u: str) -> str:
        return u.removeprefix("file:").lstrip("/")

    hit_norm = {_norm(u) for u in hit}
    return [
        rel
        for rel, ab in abs_by_rel.items()
        if _norm(ab) in hit_norm or ab in hit
    ]


def tt_delete_where(spark: SparkSession, root: str, predicate: str) -> int:
    """Delta ``DELETE FROM ... WHERE`` on the versioned log: rewrite
    ONLY the files containing matching rows (minus those rows), commit
    a new version = untouched files + rewritten files.  Old versions
    stay readable — deleted rows remain time-travelable until
    ``tt_vacuum``.  O(touched files) write cost, one column-pruned scan
    to find them."""
    from pyspark.sql import functions as F

    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    files, _stats = _resolve(spark, fs, HPath, root, manifest)
    full = _read_files(spark, root, manifest)
    flagged = (
        full.where(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
    )
    touched = _touched_relative(spark, root, files, flagged)
    if not touched:
        return head_v  # nothing matched: no new version
    pcols = _partition_cols_of(manifest)
    kept = _read_files(
        spark,
        root,
        {
            "files": touched,
            "schema": manifest.get("schema"),
            **({"partition_cols": pcols} if pcols else {}),
        },
    ).where(f"NOT ({predicate})")
    new_files = _write_data_files(
        spark, kept, root, fs, HPath, partition_cols=pcols
    )
    new_stats = _new_file_stats(spark, root, new_files, manifest, kept)
    return _publish_cow(
        spark, fs, HPath, root, head_v, manifest,
        new_files, touched, new_stats, "delete", _cow_extra(manifest),
    )


def tt_update_where(
    spark: SparkSession,
    root: str,
    set_map: dict[str, str],
    predicate: str | None = None,
) -> int:
    """Delta ``UPDATE ... SET ... WHERE`` on the versioned log: rewrite
    ONLY the files containing matching rows (matching rows get
    ``set_map``'s column → Spark-SQL-expression assignments, the file's
    other rows carry unchanged), commit a new version = untouched files
    + rewritten files.  Old versions stay readable.  O(touched files)
    write cost; updated rows are validated against the table's CHECK
    constraints on the READ-BACK of the written files before anything
    publishes."""
    from pyspark.sql import functions as F

    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    files, _stats = _resolve(spark, fs, HPath, root, manifest)
    full = _read_files(spark, root, manifest)
    for c in set_map:
        if c not in full.columns:
            raise AstroSparkError(f"tt_update_where: unknown column {c!r}")
    cond = F.expr(predicate) if predicate is not None else F.lit(True)
    flagged = (
        full.where(cond)
        .select(F.input_file_name().alias("f"))
        .distinct()
    )
    touched = _touched_relative(spark, root, files, flagged)
    if not touched:
        return head_v  # nothing matched: no new version
    # partition-column SET works too: values are physical data here, so
    # the rewrite simply re-lays the touched rows under their new
    # partition dirs — no path-only state to migrate
    pcols = _partition_cols_of(manifest)
    touched_df = _read_files(
        spark,
        root,
        {
            "files": touched,
            "schema": manifest.get("schema"),
            **({"partition_cols": pcols} if pcols else {}),
        },
    )
    # Cast each assignment back to the EXISTING column type (Delta's
    # store-assignment policy): a widening expression (``SET r = r / 2``
    # on a long column) would otherwise make when/otherwise coerce the
    # whole column to double, publishing files whose physical type
    # contradicts the log-owned schema — unreadable until tt_restore.
    rewritten = touched_df.select(
        *[
            F.when(
                cond,
                F.expr(set_map[c]).cast(touched_df.schema[c].dataType),
            )
            .otherwise(F.col(c))
            .alias(c)
            if c in set_map
            else F.col(c)
            for c in touched_df.columns
        ]
    )
    # recompute generated columns over the rewritten rows (Delta does
    # the same): a SET on a source column must move its generated
    # partition value too
    for g_name, g_expr in _generated_cols_of(manifest).items():
        rewritten = rewritten.withColumn(g_name, F.expr(g_expr))
    new_files = _write_data_files(
        spark, rewritten, root, fs, HPath, partition_cols=pcols
    )
    _check_constraints(
        _read_files(
            spark, root, {"files": new_files, "schema": manifest.get("schema")}
        ),
        manifest,
        "update",
    )
    new_stats = _new_file_stats(spark, root, new_files, manifest, rewritten)
    return _publish_cow(
        spark, fs, HPath, root, head_v, manifest,
        new_files, touched, new_stats, "update", _cow_extra(manifest),
    )


def tt_merge(
    spark: SparkSession, source: DataFrame, root: str, keys: list[str]
) -> int:
    """Delta ``MERGE INTO`` on the versioned log: upsert ``source``
    into the head version — matched rows update, new keys insert — and
    commit the result as a new version.  File-scoped copy-on-write:
    only files CONTAINING matched keys are rewritten (untouched files
    carry over by manifest reference; an untouched file cannot hold a
    matched key by construction), inserts land in the rewrite commit's
    files.  Source rows are pre-deduped deterministically on the keys
    (the engine-wide merge convention — Delta errors on source dups).
    Old versions stay readable: MERGE + time travel on plain parquet,
    the combination the Delta backend gets from its log."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .merge import _upsert

    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    files, _stats = _resolve(spark, fs, HPath, root, manifest)
    target = _read_files(spark, root, manifest)
    source = _apply_generated(source, manifest)
    source = source.select(*target.columns)  # align column order
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in source.columns])
    source = (
        source.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    # input_file_name() must be captured IN the scan stage — after the
    # join exchange it evaluates empty
    tagged = target.select(*keys, F.input_file_name().alias("f"))
    flagged = (
        tagged.join(source.select(*keys).distinct(), on=keys, how="leftsemi")
        .select("f")
        .distinct()
    )
    touched = _touched_relative(spark, root, files, flagged)
    pcols = _partition_cols_of(manifest)
    base = (
        _read_files(
            spark,
            root,
            {
                "files": touched,
                "schema": manifest.get("schema"),
                **({"partition_cols": pcols} if pcols else {}),
            },
        )
        if touched
        else target.limit(0)
    )
    merged = _upsert(base, source, keys)
    new_files = _write_data_files(
        spark, merged, root, fs, HPath, partition_cols=pcols
    )
    # validate the rewrite's ACTUAL rows (updates included) against the
    # CHECK constraints before anything publishes — one read-back of
    # the just-written files, which are still invisible
    merged_back = _read_files(
        spark, root, {"files": new_files, "schema": manifest.get("schema")}
    )
    _check_constraints(merged_back, manifest, "merge")
    _check_generated(merged_back, manifest, "merge")
    new_stats = _new_file_stats(spark, root, new_files, manifest, merged)
    return _publish_cow(
        spark, fs, HPath, root, head_v, manifest,
        new_files, touched, new_stats, "merge", _cow_extra(manifest),
    )


def tt_optimize(
    spark: SparkSession,
    root: str,
    target_files: int | None = None,
    zorder_by: list[str] | None = None,
    where: str | None = None,
) -> int:
    """Delta ``OPTIMIZE [WHERE] [ZORDER BY]`` on the versioned log:
    rewrite the head version's rows into ``target_files`` files
    (default: the session shuffle-partition count capped at the
    current file count), optionally range-partitioned on a Morton key
    over ``zorder_by`` columns so files cover compact hyper-rectangles
    (row-group pruning on any clustered dimension), and commit the
    layout as a new version.  Rows are IDENTICAL to the head version —
    only the file layout changes; old versions stay readable.

    ``where`` scopes the rewrite to a PARTITION subset — Delta's
    ``OPTIMIZE ... WHERE``, the only way to compact a 100 TB table
    incrementally: only files whose recorded partition value satisfies
    the predicate (partition columns only, the sargable shapes
    ``_skip_bounds_from_predicate`` understands) are rewritten; every
    other file carries over by manifest reference, so the commit costs
    O(selected partition), never O(table)."""
    from ..plans.zorder import with_zorder_key

    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    head_v, manifest = _head(spark, fs, HPath, root)
    pcols = _partition_cols_of(manifest)
    selected: list[str] | None = None
    if where is not None:
        if not pcols:
            raise AstroSparkError(
                "tt_optimize(where=): the table is not partitioned — "
                "OPTIMIZE WHERE selects whole partitions (Delta's rule)"
            )
        bounds = _skip_bounds_from_predicate(where)
        if not bounds or any(c not in pcols for c in bounds):
            raise AstroSparkError(
                "tt_optimize(where=): the predicate must be a sargable "
                f"conjunction over partition columns {pcols}, got "
                f"{where!r}"
            )
        files, stats = _resolve(spark, fs, HPath, root, manifest)
        # a file is selected iff its RECORDED partition value provably
        # satisfies every bound (degenerate [v, v] stats — partition
        # values are always recorded, so no file is ambiguous)
        selected = []
        for f in files:
            st = stats.get(f) or {}
            take = True
            for col, (lo, hi) in bounds.items():
                rng = st.get(col)
                try:
                    if (
                        rng is None
                        or rng[0] != rng[1]
                        or (lo is not None and rng[0] < lo)
                        or (hi is not None and rng[1] > hi)
                    ):
                        take = False
                        break
                except TypeError:  # cross-type bound: not provable
                    take = False
                    break
            if take:
                selected.append(f)
        if not selected:
            return head_v  # nothing in scope: no new version
        df = _read_files(
            spark,
            root,
            {
                "files": selected,
                "schema": manifest.get("schema"),
                **({"partition_cols": pcols} if pcols else {}),
            },
        )
    else:
        df = _read_files(spark, root, manifest)
    if target_files is None:
        n_scope = (
            len(selected)
            if selected is not None
            else int(manifest.get("n_files", len(manifest.get("files") or [])))
        )
        target_files = max(
            1,
            min(n_scope, int(spark.conf.get("spark.sql.shuffle.partitions"))),
        )
    if zorder_by:
        df = (
            with_zorder_key(df, zorder_by)
            .repartitionByRange(target_files, F_col("__zorder"))
            .drop("__zorder")
        )
    elif pcols:
        # compact WITHIN partitions: shuffle by partition value so each
        # partition's rows land together before partitionBy re-splits —
        # coalesce would glue unrelated partitions into one task whose
        # writer then re-splits them anyway
        df = df.repartition(target_files, *[F_col(c) for c in pcols])
    else:
        df = df.coalesce(target_files)
    new_files = _write_data_files(
        spark, df, root, fs, HPath, partition_cols=pcols
    )
    # zorder makes files cover COMPACT ranges — exactly when skipping
    # stats pay off; recompute them over the new layout
    stats = _new_file_stats(spark, root, new_files, manifest, df)
    if selected is not None:
        # partition-scoped: unselected files carry over by reference —
        # an O(delta) commit exactly like DML's copy-on-write
        return _publish_cow(
            spark, fs, HPath, root, head_v, manifest,
            new_files, selected, stats,
            f"optimize(where={where})", _cow_extra(manifest),
        )
    new_manifest = {
        **_body_full(spark, fs, HPath, root, new_files, stats),
        "op": (
            f"optimize(zorder={','.join(zorder_by)})"
            if zorder_by
            else "optimize"
        ),
        "ts": time.time(),
        **(
            {"schema": manifest["schema"]}
            if manifest.get("schema") is not None
            else {}
        ),
        **_carry_constraints(manifest),  # rows identical; carry
        **_carry_stats_cols(manifest),
        **_carry_partition(manifest),
        **_carry_generated(manifest),
        **_carry_props(manifest),
    }
    _publish(spark, fs, HPath, root, head_v + 1, new_manifest)
    return head_v + 1


def tt_diff(
    spark: SparkSession,
    root: str,
    key_cols: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level change feed between two versions — the query surface
    of Delta's CHANGE DATA FEED, computed from the versioned snapshots
    themselves: (diff_status ∈ added/removed/changed, *key_cols) for
    every key whose row differs between ``from_version`` and
    ``to_version`` (default: head).  One full-outer join on the keys;
    non-key columns ride as two hashes, so the shuffle is key-width
    regardless of row width (``catalog.diff_dataframes``' contract).
    Because manifests share unchanged files, at scale this can prune to
    the files the manifests DON'T share; the semantic diff here is
    correct for any pair, including across overwrite/restore."""
    from .catalog import diff_dataframes

    return diff_dataframes(
        tt_read(spark, root, from_version),
        tt_read(spark, root, to_version),
        key_cols,
        names=(f"v{from_version}", f"v{to_version if to_version is not None else 'head'}"),
    )


def tt_clone(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    version: int | None = None,
) -> int:
    """Delta ``SHALLOW CLONE``: create ``dst_root`` as version 0
    REFERENCING the source version's data files by absolute path —
    zero bytes copied, instant dev/test sandboxes over any-size tables.
    Reads serve the source's files through the clone's own log; every
    WRITE to the clone copies-on-write into the clone's ``files/``
    (append adds local files; merge/delete/update rewrite only touched
    files locally and drop their external refs), so the source is
    never modified; ``tt_vacuum`` on the clone never deletes external
    refs (the source owns them).  Constraints, skipping stats and the
    schema carry over.  Hazard shared with Delta's shallow clone: a
    later VACUUM on the SOURCE can delete files the clone still
    references — deep-copy (``tt_create`` from ``tt_read``) when the
    source's retention isn't under your control."""
    src_root = _named_root(spark, src_root)  # BEFORE the path check:
    # a registered db.table name resolves to its absolute root first
    if not _is_external(_abs(src_root, "files")):
        raise ValueError(
            f"tt_clone: src_root must be an absolute path or URI (or a "
            f"tt_register'd name), got {src_root!r}"
        )
    HPath, _p, fs = _fs(spark, src_root)
    versions = _list_versions(fs, HPath, src_root)
    if not versions:
        raise AstroSparkError(f"no versioned table at {src_root}")
    version = versions[-1] if version is None else version
    if version not in versions:
        raise AstroSparkError(f"version {version} not found in {src_root}")
    m = _read_manifest(spark, fs, HPath, src_root, version)
    files, stats = _resolve(spark, fs, HPath, src_root, m)
    src_pcols = _partition_cols_of(m)
    if src_pcols and any(_path_valued(f, src_pcols) for f in files):
        raise AstroSparkError(
            "tt_clone: the source version still references ADOPTED Hive "
            "files whose partition values live only in their paths — a "
            "clone's absolute refs would lose the basePath those values "
            "resolve against.  OPTIMIZE the source first (rewrites "
            "adopted files into the engine layout), then clone."
        )
    abs_files = [_abs(src_root, f) for f in files]
    abs_stats = {_abs(src_root, f): s for f, s in stats.items()}
    dst_root = _named_root(spark, dst_root)
    dHPath, _dp, dfs = _fs(spark, dst_root)
    if _list_versions(dfs, dHPath, dst_root):
        raise AstroSparkError(f"versioned table already exists at {dst_root}")
    manifest = {
        **_body_full(spark, dfs, dHPath, dst_root, abs_files, abs_stats),
        "op": f"clone({src_root}@v{version})",
        "ts": time.time(),
    }
    if m.get("schema") is not None:
        manifest["schema"] = m["schema"]
    if m.get("constraints") is not None:
        manifest["constraints"] = m["constraints"]
    if m.get("stats_cols") is not None:
        manifest["stats_cols"] = m["stats_cols"]
    if m.get("partition_cols") is not None:
        manifest["partition_cols"] = m["partition_cols"]
    if m.get("generated_cols") is not None:
        manifest["generated_cols"] = m["generated_cols"]
    if m.get("properties") is not None:
        manifest["properties"] = m["properties"]
    _publish(spark, dfs, dHPath, dst_root, 0, manifest)
    return 0


def tt_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level CHANGE DATA FEED computed from the log's file deltas —
    no stored change files, no key columns needed: for each version v
    in (``from_version``, ``to_version``], the rows of v's ADDED files
    multiset-minus the rows of its REMOVED files are the inserts, the
    reverse are the deletes (an update surfaces as delete+insert, the
    pre/post image pair).  Unchanged rows carried by a file rewrite
    appear on both sides and cancel exactly, so the scan cost is
    O(churned files), never O(table) — and a pure re-layout commit
    (OPTIMIZE) correctly yields zero change rows.  Columns:
    ``(*table columns, _change_type, _commit_version)``.  Use
    ``tt_diff`` instead when you have key columns and want
    added/removed/changed per key between two arbitrary snapshots."""
    from pyspark.sql import functions as F

    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    versions = _list_versions(fs, HPath, root)
    if from_version not in versions:
        raise AstroSparkError(
            f"version {from_version} not found in {root} (vacuumed?)"
        )
    to_version = versions[-1] if to_version is None else to_version
    if to_version not in versions:
        raise AstroSparkError(f"version {to_version} not found in {root}")
    out = None
    prev_m = _read_manifest(spark, fs, HPath, root, from_version)
    prev_files, _ = _resolve(spark, fs, HPath, root, prev_m)
    for v in [x for x in versions if from_version < x <= to_version]:
        cur_m = _read_manifest(spark, fs, HPath, root, v)
        cur_files, _ = _resolve(spark, fs, HPath, root, cur_m)
        prev_set, cur_set = set(prev_files), set(cur_files)
        added = [f for f in cur_files if f not in prev_set]
        removed = [f for f in prev_files if f not in cur_set]
        # read BOTH sides through the newer schema (the log owns it:
        # pre-evolution files read new columns as NULL), so the
        # multiset compare is well-typed across schema evolution
        synth = {
            "schema": cur_m.get("schema"),
            **_carry_partition(cur_m),  # adopted files: path values
        }
        added_df = (
            _read_files(spark, root, {"files": added, **synth})
            if added
            else None
        )
        removed_df = (
            _read_files(spark, root, {"files": removed, **synth})
            if removed
            else None
        )
        if added_df is None and removed_df is None:
            prev_files = cur_files
            continue
        if added_df is None:
            added_df = removed_df.limit(0)
        if removed_df is None:
            removed_df = added_df.limit(0)
        ins = added_df.exceptAll(removed_df).withColumn(
            "_change_type", F.lit("insert")
        )
        dels = removed_df.exceptAll(added_df).withColumn(
            "_change_type", F.lit("delete")
        )
        chg = ins.unionByName(dels).withColumn(
            "_commit_version", F.lit(v).cast("long")
        )
        out = chg if out is None else out.unionByName(
            chg, allowMissingColumns=True
        )
        prev_files = cur_files
    if out is None:  # no versions in range, or only no-op commits
        base = _read_files(spark, root, prev_m).limit(0)
        return base.withColumn("_change_type", F.lit("")).withColumn(
            "_commit_version", F.lit(0).cast("long")
        ).limit(0)
    return out


def tt_changes_drain(
    spark: SparkSession,
    root: str,
    state_path: str,
    fn,
) -> list[int]:
    """Incremental change-feed consumption — the versioned log as a
    STREAMING SOURCE (Delta's ``readStream`` on a table), in the same
    drain idiom as the rest of the streaming module: read the last
    consumed version from ``state_path``, hand
    ``fn(changes_df, head_version)`` the CDF for every version since,
    then persist the new offset.  At-least-once: a crash between fn and
    the offset write replays the same versions — make fn idempotent
    (keyed upserts are; blind appends need the offset check).  First
    call consumes from version 0 (the create's rows arrive as
    inserts... of version > 0; seed state with ``-1`` semantics by
    passing a table whose v0 matters through fn yourself, or start the
    feed after tt_create).  Returns the versions consumed."""
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    versions = _list_versions(fs, HPath, root)
    if not versions:
        raise AstroSparkError(f"no versioned table at {root}")
    head = versions[-1]
    sp = HPath(state_path)
    state_fs = sp.getFileSystem(spark._jsc.hadoopConfiguration())
    last = versions[0]
    if state_fs.exists(sp):
        stream = state_fs.open(sp)
        try:
            txt = spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        last = int(json.loads(txt)["version"])
    if head <= last:
        return []
    consumed = [v for v in versions if last < v <= head]
    fn(tt_changes(spark, root, last, head), head)
    stream = state_fs.create(sp, True)  # offset overwrite is the ack
    try:
        stream.write(bytearray(json.dumps({"version": head}).encode("utf-8")))
    finally:
        stream.close()
    return consumed


def tt_vacuum(
    spark: SparkSession,
    root: str,
    keep_last: int = 1,
    dry_run: bool = False,
) -> int:
    """Delete data files referenced ONLY by versions older than the
    last ``keep_last``, then drop those versions' manifests.  Returns
    the number of data files deleted.  Time travel to vacuumed
    versions stops working — exactly Delta ``VACUUM``'s trade.
    ``dry_run=True`` (Delta ``VACUUM ... DRY RUN``) counts the data
    files that WOULD be reclaimed and changes nothing."""
    if keep_last < 1:
        raise ValueError("tt_vacuum: keep_last must be >= 1")
    root = _named_root(spark, root)
    HPath, _p, fs = _fs(spark, root)
    versions = _list_versions(fs, HPath, root)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    live: set[str] = set()
    live_refs: set[str] = set()
    for v in keep:
        m = _read_manifest(spark, fs, HPath, root, v)
        fl, _st = _resolve(spark, fs, HPath, root, m)
        live |= set(fl)
        if "base" in m:
            live_refs.add(m["base"])
    deleted = 0
    reclaimed: set[str] = set()
    dead_refs: set[str] = set()
    # local roots check/delete through the OS (one syscall each) — the
    # gateway pays 2 round-trips per file (~0.7 ms), which turns a
    # 10⁵-file reclaim into minutes for no reason
    import os as _os

    local = "://" not in root or root.startswith("file:")

    def _lpath(f: str) -> str:
        ab = f"{root}/{f}"
        if ab.startswith("file:"):
            ab = ab[5:].lstrip("/")
            ab = ab if ab.startswith("/") else "/" + ab
        return ab

    for v in drop:
        m = _read_manifest(spark, fs, HPath, root, v)
        fl, _st = _resolve(spark, fs, HPath, root, m)
        for f in fl:
            if _is_external(f):
                continue  # shallow-clone ref: the SOURCE table owns it
            if f in live or f in reclaimed:  # shared across versions
                continue
            if local:
                if not _os.path.exists(_lpath(f)):
                    continue
                if not dry_run:
                    try:
                        _os.remove(_lpath(f))
                    except OSError:
                        continue
            else:
                if not fs.exists(HPath(f"{root}/{f}")):
                    continue
                if not dry_run:
                    fs.delete(HPath(f"{root}/{f}"), False)
            reclaimed.add(f)
            deleted += 1
        if "base" in m and m["base"] not in live_refs:
            dead_refs.add(m["base"])
        if not dry_run:
            fs.delete(HPath(f"{root}/{_LOG}/{_manifest_name(v)}"), False)
    if dry_run:
        return deleted  # nothing touched: no manifest drops, no sweeps
    # checkpoints referenced only by vacuumed manifests are log garbage
    for ref in dead_refs:
        if fs.exists(HPath(f"{root}/{ref}")):
            fs.delete(HPath(f"{root}/{ref}"), False)
    # ORPHANED checkpoints: a commit retry that lost its optimistic-
    # concurrency race (or an abandoned tail compaction) writes a
    # _log/ckpt-*.parquet that no manifest ever references — on
    # contended tables those full-snapshot files leak indefinitely.
    # After this vacuum only `keep` manifests survive, so any ckpt not
    # in their base refs is dead.  A brief grace window protects a
    # checkpoint written by an IN-FLIGHT commit whose manifest hasn't
    # published yet (Delta's VACUUM retention serves the same purpose);
    # tests may set spark.astro.tt.vacuumCkptGraceSec=0.
    try:
        grace_s = float(
            spark.conf.get("spark.astro.tt.vacuumCkptGraceSec", "600")
        )
    except Exception:  # pragma: no cover - exotic conf backend
        grace_s = 600.0
    # derive "now" from the FILESYSTEM's clock, not the driver JVM's:
    # touch a probe file under _log and read back its mtime, so
    # driver/storage clock skew beyond the grace window can never make
    # an in-flight commit's checkpoint look old enough to delete.
    # Fall back to the JVM clock only if the FS won't stamp the probe.
    try:
        probe = HPath(f"{root}/{_LOG}/.clock-probe-{uuid.uuid4().hex}")
        stream = fs.create(probe, True)
        stream.close()
        now_ms = fs.getFileStatus(probe).getModificationTime()
        fs.delete(probe, False)
    except Exception:  # pragma: no cover - read-only or exotic FS
        now_ms = spark._jvm.java.lang.System.currentTimeMillis()
    log = HPath(f"{root}/{_LOG}")
    if fs.exists(log):
        for st in fs.listStatus(log):
            name = st.getPath().getName()
            if not (name.startswith("ckpt-") and name.endswith(".parquet")):
                continue
            ref = f"{_LOG}/{name}"
            if ref in live_refs:
                continue
            if now_ms - st.getModificationTime() < grace_s * 1000.0:
                continue  # possibly an in-flight commit's checkpoint
            fs.delete(st.getPath(), False)
    return deleted


# ---------------------------------------------------------------------------
# Name registry: catalog-style identifiers for versioned roots
# ---------------------------------------------------------------------------
#
# The reference's Delta surface is NAME-addressed: CTAS `USING DELTA`
# into `schema.table` (databases/databricks/delta.py:168-187) and MERGE
# on names (:357-442).  This engine's versioned tables are PATH-
# addressed (any Hadoop FS root).  The registry bridges the two: a
# session-scoped mapping `db.table -> root` lets every routed Delta SQL
# shape (`run_raw_sql`) accept bare identifiers — the statement text a
# reference user already writes — by substituting the quoted-root form
# before routing.  Session-scoped on purpose: a real metastore owns
# durable name->location mappings; this is the in-session equivalent of
# `CREATE TEMPORARY VIEW`, with no hidden persistent state.

import weakref as _weakref

_NAME_REGISTRY: "_weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    _weakref.WeakKeyDictionary()
)


def _validate_table_name(name: str) -> str:
    """Normalize + validate a 1- or 2-part dotted identifier (Spark
    identifiers are case-insensitive -> registry keys are lowercase)."""
    from ..table import validate_identifier

    parts = [p.strip().strip("`") for p in name.strip().split(".")]
    if not 1 <= len(parts) <= 2 or not all(parts):
        raise AstroSparkError(
            f"tt_register: expected `table` or `db.table`, got {name!r}"
        )
    return ".".join(validate_identifier(p).lower() for p in parts)


def tt_register(spark: SparkSession, name: str, root: str) -> None:
    """Register ``name`` (``table`` or ``db.table``) as a session alias
    for the versioned root at ``root``.  Afterwards every routed Delta
    SQL shape in ``run_raw_sql`` accepts the bare identifier::

        tt_register(spark, "sales.orders", "/data/orders_v")
        run_raw_sql(spark, "MERGE INTO sales.orders t USING src s ON ...")
        run_raw_sql(spark, "SELECT * FROM sales.orders VERSION AS OF 3")
        run_raw_sql(spark, "DESCRIBE HISTORY sales.orders")

    The root need not exist yet (a registered name may be the DST of
    ``CREATE TABLE name SHALLOW CLONE ...`` or an INSERT-create);
    resolution errors surface at use, exactly as with quoted paths.

    The PYTHON surface resolves names too: every ``tt_*`` operator's
    ``root`` argument accepts a registered name (path-shaped strings —
    anything with a separator — always pass through untouched)."""
    if "'" in root or "\n" in root or "\r" in root:
        # the root is substituted into SQL text as a quoted literal —
        # a quote or newline inside it would break out of the literal
        raise AstroSparkError(
            f"tt_register: root may not contain quotes or newlines: {root!r}"
        )
    _NAME_REGISTRY.setdefault(spark, {})[_validate_table_name(name)] = root


def tt_unregister(spark: SparkSession, name: str) -> None:
    """Drop a session name alias (no effect on the table's data)."""
    _NAME_REGISTRY.get(spark, {}).pop(_validate_table_name(name), None)


def tt_registered(spark: SparkSession) -> dict[str, str]:
    """Snapshot of this session's ``name -> versioned root`` aliases."""
    return dict(_NAME_REGISTRY.get(spark, {}))


def tt_resolve_name(spark: SparkSession, name: str) -> str | None:
    """The root ``name`` is registered to, or None (case-insensitive)."""
    try:
        key = _validate_table_name(name)
    except Exception:
        return None
    return _NAME_REGISTRY.get(spark, {}).get(key)
