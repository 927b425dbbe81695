"""Nested-struct flattening (json_normalize parity).

Reference: NDJSON loads flatten nested objects with pandas.json_normalize
using a separator (default ``_``): ``{"a":{"b":1}}`` → column ``a_b``
(``files/types/ndjson.py:54-96``, ``sql/operators/load_file.py:205-243``).

In Spark this is a pure projection — no shuffle, fully codegen'd — so the
reference's chunked-flatten-and-concat machinery reduces to one select.
Spark can also *keep* nesting (a strict upgrade); flattening is the default
for NDJSON loads to match reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _walk(dtype, path: list[str], alias_parts: list[str], sep: str, out: list):
    if isinstance(dtype, StructType):
        for field in dtype.fields:
            _walk(field.dataType, path + [field.name], alias_parts + [field.name], sep, out)
    else:
        dotted = ".".join(f"`{p}`" for p in path)
        out.append(F.col(dotted).alias(sep.join(alias_parts)))


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten struct columns: ``a.b`` → ``a_b`` (sep param).

    Arrays/maps are left as-is (the reference's json_normalize also leaves
    lists in a single column).
    """
    if not any(isinstance(f.dataType, StructType) for f in df.schema.fields):
        return df
    cols: list = []
    for field in df.schema.fields:
        _walk(field.dataType, [field.name], [field.name], sep, cols)
    return df.select(*cols)
