"""get_file_list: list files under a path/prefix.

Reference: ``files/operators/files.py:13-43`` + per-store ``paths``
properties (S3 at ``files/locations/amazon/s3.py:35-43``, local glob at
``files/locations/local.py``).  Spark rebuild: one Hadoop-FS globStatus
call — works for every scheme Spark itself can read (file:// s3a:// gs://
abfss:// hdfs://), so the per-store classes collapse.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_file_list(spark: SparkSession, path_pattern: str) -> list[str]:
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path_pattern)
    fs = jpath.getFileSystem(hconf)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    out = []
    for st in statuses:
        if st.isDirectory():
            for sub in fs.listStatus(st.getPath()):
                out.append(sub.getPath().toString())
        else:
            out.append(st.getPath().toString())
    return sorted(out)
