"""Location handling for protocols Hadoop FS does not cover.

Reference ships per-store location classes (``files/locations/``: S3 100
LoC, GCS 115, GDrive 151, Azure WASB 158, HTTP 44, SFTP 97, FTP 74).
Spark's Hadoop FS layer natively reads ``s3a:// gs:// abfss:// hdfs://
file://`` plus globs, so those classes collapse to nothing.  What remains
is driver-side staging for request/response protocols (HTTP(S); SFTP/FTP
stubbed pending client libs) — mirroring the reference's smart_open
usage (``files/base.py:153-188``), which is also driver-side.

Staged files are small by nature (no distributed range reads over HTTP);
big data belongs on an object store where executors read in parallel.
"""

from __future__ import annotations

import os
import tempfile
import urllib.request
from urllib.parse import urlparse

HADOOP_SCHEMES = {"", "file", "hdfs", "s3a", "s3", "gs", "abfs", "abfss", "wasb", "wasbs", "viewfs"}


def stage_if_needed(path: str) -> str:
    """Return a Spark-readable path, staging driver-side when required."""
    scheme = urlparse(path).scheme.lower()
    if scheme in HADOOP_SCHEMES:
        return path
    if scheme in ("http", "https"):
        return _stage_http(path)
    if scheme in ("sftp", "ftp"):
        raise NotImplementedError(
            f"{scheme}:// staging requires paramiko/ftplib wiring not enabled "
            "in this build; download the file to local/object storage first"
        )
    return path


def _stage_http(url: str) -> str:
    suffix = os.path.splitext(urlparse(url).path)[1] or ".dat"
    fd, local = tempfile.mkstemp(prefix="astro_http_", suffix=suffix)
    os.close(fd)
    with urllib.request.urlopen(url) as resp, open(local, "wb") as out:  # noqa: S310
        while True:
            chunk = resp.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return local
