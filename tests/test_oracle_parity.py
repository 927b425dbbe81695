"""Oracle dtype parity: every oracle's DuckDB→pandas result must carry
the same column *type classes* as the Spark query's pandas result.

This is the early-warning lint for the round-4 driver incident: DuckDB
``SUM(BIGINT)`` returns HUGEINT (int128), which silently degrades to
float64 through the Arrow/pandas fetch the driver uses, while Spark's
SUM stays int64 — equal values, different canonical hash.  The
correctness checker now hashes pandas frames on both sides so such a
divergence FAILS, but only for the queries a round happens to rotate
in; this test sweeps all of them at sf0.001 in one session.

Type classes, not exact dtypes: int64 vs int32 canonicalizes
identically, and a Timestamp column may surface as datetime64 or as
object-of-datetime depending on the fetch path — both canon to the
same string.  What must NEVER differ across the two engines is the
class (int vs float vs datetime vs date vs string vs sequence), because
the canonical form differs across classes even for equal values.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

import __spark_entry__ as entry

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _dclass(series) -> str:
    import numpy as np
    import pandas.api.types as pt

    d = series.dtype
    if pt.is_bool_dtype(d):
        return "bool"
    if pt.is_integer_dtype(d):
        return "int"
    if pt.is_float_dtype(d):
        return "float"
    if pt.is_datetime64_any_dtype(d):
        return "datetime"
    # object column: classify by the first non-null scalar
    for v in series:
        if v is None:
            continue
        try:
            import pandas as pd

            if v is pd.NaT or v is pd.NA:
                continue
        except Exception:  # noqa: BLE001
            pass
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, dt.datetime):
            return "datetime"
        if isinstance(v, dt.date):
            # the checker (and driver) canon dates as midnight
            # datetimes, so date vs datetime is one class
            return "datetime"
        if isinstance(v, bytes):
            return "bytes"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "seq"
        if isinstance(v, str):
            return "str"
        return type(v).__name__
    return "all-null"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_oracle_dtype_parity(spark, sf_dir, duck):
    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad: list[str] = []
    for name, fn in queries.items():
        sql = oracles.get(name)
        if sql is None:
            continue
        spdf = fn(spark, sf_dir).toPandas()
        opdf = duck.sql(sql).fetchdf()
        scls = {c: _dclass(spdf[c]) for c in spdf.columns}
        ocls = {c: _dclass(opdf[c]) for c in opdf.columns}
        for c in sorted(set(scls) | set(ocls)):
            a, b = scls.get(c, "MISSING"), ocls.get(c, "MISSING")
            # an all-null / empty column constrains nothing
            if a == b or "all-null" in (a, b):
                continue
            bad.append(f"{name}.{c}: spark={a} oracle={b}")
    assert bad == [], "\n".join(bad)
