"""File handle + filetype inference.

Reference: ``python-sdk/src/astro/files/base.py``
- ``File``: path, conn_id, explicit or extension-inferred filetype,
  ``normalize_config`` for nested JSON            (files/base.py:19-44)
- type dispatch by extension                      (files/base.py:70-77)
- pattern resolution (``resolve_file_path_pattern``, files/base.py:253-287)
  disappears in Spark: every reader accepts globs/directories natively.

Locations: the reference ships per-store location classes (S3/GCS/WASB/
HTTP/SFTP/FTP/GDrive, ``files/locations/``).  Spark's Hadoop FS layer
handles ``s3a:// gs:// abfss:// hdfs:// file://`` URIs transparently, so a
location class is only needed for protocols Hadoop lacks (HTTP/SFTP/FTP),
which are staged driver-side — see ``sources/locations.py``.
"""

from __future__ import annotations

import pathlib
from dataclasses import dataclass, field
from enum import Enum
from typing import Any


class FileType(str, Enum):
    CSV = "csv"
    JSON = "json"
    NDJSON = "ndjson"
    PARQUET = "parquet"
    ORC = "orc"
    XLSX = "xlsx"
    XLS = "xls"

    def __str__(self) -> str:  # pragma: no cover
        return self.value


_EXTENSION_MAP = {
    ".csv": FileType.CSV,
    ".json": FileType.JSON,
    ".ndjson": FileType.NDJSON,
    ".jsonl": FileType.NDJSON,
    ".parquet": FileType.PARQUET,
    ".orc": FileType.ORC,
    ".pq": FileType.PARQUET,
    ".xlsx": FileType.XLSX,
    ".xls": FileType.XLS,
}


def infer_filetype(path: str) -> FileType:
    """Extension-based dispatch (reference files/base.py:70-77)."""
    # strip glob chars so "dir/*.csv" infers csv
    cleaned = path.rstrip("*?")
    suffix = pathlib.PurePosixPath(cleaned).suffix.lower()
    if suffix in _EXTENSION_MAP:
        return _EXTENSION_MAP[suffix]
    raise ValueError(
        f"cannot infer filetype from {path!r}; pass filetype= explicitly"
    )


@dataclass
class File:
    """Handle to a file, directory, or glob pattern."""

    path: str
    conn_id: str = ""  # API parity; Hadoop FS handles credentials
    filetype: FileType | None = None
    normalize_config: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.filetype is None:
            try:
                self.filetype = infer_filetype(self.path)
            except ValueError:
                self.filetype = None  # directories: resolved at load time
        elif isinstance(self.filetype, str):
            self.filetype = FileType(self.filetype.lower())

    @property
    def dataset_uri(self) -> str:
        """Lineage URI (reference files/base.py:206-225): the path itself,
        scheme-qualified (bare local paths become ``file://``)."""
        if "://" in self.path:
            return self.path
        return f"file://{self.path}"

    @property
    def is_pattern(self) -> bool:
        return any(ch in self.path for ch in "*?[")
