"""Table / TempTable / Metadata models.

Reference semantics: ``python-sdk/src/astro/table.py``
- ``Metadata`` (schema, database) namespace pair            (table.py:18-34)
- ``BaseTable`` handle: name, conn_id, metadata, columns,
  temp flag; stores no data                                 (table.py:37-199)
- temp names are ``_tmp_<random>`` capped at 62 chars       (table.py:14-15, 68-94)
- ``Table()`` with no/`_tmp`-prefixed name silently becomes
  a temp table                                              (table.py:213-235)

In Spark the handle names a catalog table or a temp view in the single
shared SparkSession; ``conn_id`` is retained for API parity but unused.
"""

from __future__ import annotations

import random
import re
import string
from dataclasses import dataclass, field
from typing import Any

from .exceptions import IllegalIdentifierError

MAX_TABLE_NAME_LENGTH = 62  # reference: table.py:14
TEMP_PREFIX = "_tmp"  # reference: table.py:15

_IDENTIFIER_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")


def validate_identifier(name: str) -> str:
    """Guard identifiers before f-string interpolation into spark.sql.

    Replaces the reference's per-dialect quoting/injection checks
    (``snowflake.py:1107-1155``) with a single strict allowlist.
    """
    if not name or not _IDENTIFIER_RE.match(name):
        raise IllegalIdentifierError(f"illegal SQL identifier: {name!r}")
    return name


def _random_suffix(n: int = 8) -> str:
    return "".join(random.choices(string.ascii_lowercase + string.digits, k=n))


@dataclass
class Metadata:
    """(schema, database) namespace pair; reference table.py:18-34."""

    schema: str | None = None
    database: str | None = None

    def is_empty(self) -> bool:
        return self.schema is None and self.database is None


@dataclass
class Table:
    """Handle/pointer to a Spark catalog table or temp view (no data)."""

    name: str = ""
    conn_id: str = ""  # API parity; single-engine, unused
    metadata: Metadata = field(default_factory=Metadata)
    columns: list[Any] = field(default_factory=list)  # list[StructField]
    temp: bool = False

    def __post_init__(self) -> None:
        if not self.name:
            self.name = f"{TEMP_PREFIX}_{_random_suffix()}"[:MAX_TABLE_NAME_LENGTH]
            self.temp = True
        elif self.name.startswith(TEMP_PREFIX):
            self.temp = True
        validate_identifier(self.name)
        if self.metadata.schema:
            validate_identifier(self.metadata.schema)

    @property
    def qualified_name(self) -> str:
        """``schema.name`` when a schema is set, else bare name.

        Temp tables are session temp views → never schema-qualified.
        """
        if self.metadata.schema and not self.temp:
            return f"{self.metadata.schema}.{self.name}"
        return self.name

    def row_count(self, spark) -> int:
        """Reference table.py:115-121."""
        return spark.table(self.qualified_name).count()

    @property
    def dataset_uri(self) -> str:
        """Lineage URI for data-aware scheduling (reference
        table.py:237-250): ``astro://<conn>@?table=…&schema=…``."""
        from urllib.parse import urlencode

        params: dict[str, str] = {"table": self.name}
        if self.metadata.schema:
            params["schema"] = self.metadata.schema
        if self.metadata.database:
            params["database"] = self.metadata.database
        return f"astro://{self.conn_id}@?{urlencode(params)}"

    def to_json(self) -> dict[str, Any]:
        """Serializable handle (reference table.py:128-147)."""
        return {
            "class": "TempTable" if self.temp else "Table",
            "name": self.name,
            "metadata": {
                "schema": self.metadata.schema,
                "database": self.metadata.database,
            },
            "temp": self.temp,
        }

    @classmethod
    def from_json(cls, obj: dict[str, Any]) -> "Table":
        md = obj.get("metadata") or {}
        return cls(
            name=obj["name"],
            metadata=Metadata(schema=md.get("schema"), database=md.get("database")),
            temp=bool(obj.get("temp")),
        )


def TempTable(**kwargs: Any) -> Table:
    """Factory for an auto-named temp table (reference table.py:202-210)."""
    kwargs.pop("name", None)
    return Table(name="", **kwargs)
