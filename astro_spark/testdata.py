"""Helpers for the driver-generated testdata tables (TESTDATA.md).

``read_table`` loads one of the known tables from an sf directory and
normalizes physical quirks so downstream queries see clean logical types:

- ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (arrives as
  LongType nanoseconds under ``spark.sql.legacy.parquet.nanosAsLong``)
  and as TIMESTAMP(MICROS) without UTC adjustment (arrives as
  TIMESTAMP_NTZ).  Both are normalized to a proper TimestampType here —
  watermarks and window functions require it, and the wall-clock values
  match DuckDB's naive reading in the UTC session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_field = df.schema["ts"]
        if isinstance(ts_field.dataType, LongType):
            # integer division: epoch-nanos exceed double's 2^53 exact range,
            # so (ts / 1000).cast(long) is off by 1µs for ~12% of rows
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_field.dataType, TimestampNTZType):
            # TIMESTAMP(MICROS) isAdjustedToUTC=false: same wall-clock in
            # the UTC session, but watermarks need TimestampType
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every testdata table as a temp view (oracle parity: the
    driver pre-registers the same names as DuckDB views)."""
    for name in tables:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
