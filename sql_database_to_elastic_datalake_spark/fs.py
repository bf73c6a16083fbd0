"""Filesystem helpers that work for every Hadoop-resolvable URI scheme.

``os.path.exists`` silently answers ``False`` for ``hdfs://`` / ``s3a://``
URIs — paths that are perfectly valid targets for ``spark.read/write``.
Any "create on first write, merge afterwards" logic keyed on it would
take the first-batch branch on EVERY batch against a remote lake and
overwrite the table each time. These helpers route the question through
the Hadoop ``FileSystem`` resolved FROM the path, so local paths, HDFS
and object stores all answer correctly.
"""

from __future__ import annotations


def path_exists(spark, path: str) -> bool:
    """True iff ``path`` exists on the filesystem its scheme resolves to
    (local path -> local FS, ``hdfs://``/``s3a://`` -> that store).

    Mirrors what ``spark.read.parquet(path)`` would consult, which is the
    only existence notion that matters for lake targets.
    """
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hadoop_path))
