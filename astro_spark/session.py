"""SparkSession factory for the astro_spark engine.

The reference (astro-sdk-python) dispatches every operation to one of ~10
database backends via an Airflow connection (``databases/__init__.py:29-52``
in the reference).  In the Spark rebuild there is exactly one engine: a
SparkSession whose catalog plays the role of the warehouse.  This module
owns session construction and the scale-oriented defaults.

Scale notes (100 TB design):
- AQE on (runtime coalesce + skew-join splitting) so the same code runs on
  local[32] and a 1000-executor cluster without re-tuning.
- ``spark.sql.shuffle.partitions`` defaults to a small number locally but is
  env-overridable; on a real cluster AQE coalesces from a high initial value.
- Arrow enabled for every pandas interchange (the reference moves data
  through pandas in 1M-row chunks; we move it through Arrow batches).
- Session timezone pinned to UTC so timestamp semantics are deterministic
  across engines (matters for oracle comparison and for cross-cluster runs).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
_warehouse_dir: str | None = None


def _process_warehouse() -> str:
    global _warehouse_dir
    if _warehouse_dir is None:
        _warehouse_dir = tempfile.mkdtemp(prefix="astro_spark_wh_")
    return _warehouse_dir


def default_conf() -> dict[str, str]:
    """Engine defaults. Everything here is safe on a large cluster."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
        ),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.parquet.filterPushdown": "true",
        # parquet files with TIMESTAMP(NANOS) (e.g. pandas-written ns
        # timestamps) are unreadable in Spark 4 without this: they surface
        # as LongType nanos; readers.normalize_nanos_timestamps restores a
        # proper timestamp column.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.autoBroadcastJoinThreshold": "64MB",
        # Explicit-file-list reads (tt_read hands the parquet source its
        # manifest's 10^4-10^6 paths) run a distributed LISTING job whose
        # task count defaults to parallelPartitionDiscovery.parallelism
        # = 10000 — at 50k files that is 10000 near-empty tasks of pure
        # scheduler overhead (measured: construction 24.6 s -> 7.5-10.8 s
        # with the cap, r12 file-count sweep, PERF.md).  Cap at a small
        # multiple of the core count; on a real cluster this scales with
        # executors via SPARK_GRAFT_CPUS.
        "spark.sql.sources.parallelPartitionDiscovery.parallelism": str(
            max(64, int(_DEFAULT_CPUS) * 2 if _DEFAULT_CPUS.isdigit() else 64)
        ),
        # files.maxPartitionBytes default 128MB is right for 100TB scans;
        # leave as-is. Driver-side niceties:
        "spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }


def get_session(
    app_name: str = "astro_spark",
    master: str | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    A single session is the unit of catalog + temp-view scope; the
    reference's ``conn_id`` concept collapses into this one session.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{_DEFAULT_CPUS}]")
    if warehouse_dir is None:
        # unique per process: Spark's in-memory catalog forgets tables on
        # restart but their files remain; a shared static dir would then
        # fail saveAsTable with LOCATION_ALREADY_EXISTS.
        warehouse_dir = os.environ.get("SPARK_GRAFT_WAREHOUSE") or _process_warehouse()
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = default_conf()
    conf["spark.sql.warehouse.dir"] = warehouse_dir
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark
