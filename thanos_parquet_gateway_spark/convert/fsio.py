"""Hadoop-FileSystem-backed sidecar / control-plane I/O.

The reference routes ALL sidecar and discovery I/O through an
object-storage bucket client (reference locate/bucket.go:37-105,
locate/discover.go), so meta.pb / stream.pb / deletion markers live
wherever the data lives.  The Spark-first analogue is the Hadoop
``FileSystem`` API reached through the live JVM — the SAME connector
stack the executors' parquet reads already use — so these helpers work
uniformly on ``file:``, ``s3a:``, ``gs:``, ``abfs:``, ``hdfs:`` and bare
local paths (qualified against ``fs.defaultFS``).  This replaces the
previous ``pathlib`` implementation, under which sidecars silently were
NOT written when the table lived on a non-local URI.

Driver-side control-plane traffic only: every call here moves a few
hundred bytes per block (sidecars) or lists a partition tree once —
never sample data.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _active_spark(spark: SparkSession | None) -> SparkSession:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "fsio needs a SparkSession (for the JVM Hadoop FileSystem); "
            "none passed and no active session")
    return spark


def _fs_path(path: str, spark: SparkSession | None):
    """(FileSystem, Path) for ``path``, resolved by the path's own scheme
    against the session Hadoop conf — exactly how Spark's writers pick
    their target FS."""
    spark = _active_spark(spark)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(str(path))
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def qualified(path: str, spark: SparkSession | None = None) -> str:
    """Canonical fully-qualified form (e.g. ``/tmp/t`` -> ``file:/tmp/t``)
    so strings derived from user paths compare equal to strings derived
    from ``DataFrame.inputFiles()`` URIs."""
    fs, p = _fs_path(path, spark)
    return str(fs.makeQualified(p))


def parent(path: str, spark: SparkSession | None = None) -> str:
    spark = _active_spark(spark)
    return str(spark._jvm.org.apache.hadoop.fs.Path(str(path)).getParent())


def join(base: str, *parts: str) -> str:
    """URI-safe path join (``pathlib`` would eat the ``s3a://`` scheme)."""
    return "/".join([str(base).rstrip("/")] + [p.strip("/") for p in parts])


def write_bytes(path: str, data: bytes,
                spark: SparkSession | None = None) -> None:
    """Create-or-overwrite ``path`` with ``data`` (atomic per object-store
    semantics: a single create/close, no partial appends)."""
    fs, p = _fs_path(path, spark)
    out = fs.create(p, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_bytes(path: str, spark: SparkSession | None = None) -> bytes:
    spark = _active_spark(spark)
    fs, p = _fs_path(path, spark)
    ins = fs.open(p)
    try:
        return bytes(spark._jvm.org.apache.commons.io.IOUtils
                     .toByteArray(ins))
    finally:
        ins.close()


def exists(path: str, spark: SparkSession | None = None) -> bool:
    fs, p = _fs_path(path, spark)
    return bool(fs.exists(p))


def is_dir(path: str, spark: SparkSession | None = None) -> bool:
    fs, p = _fs_path(path, spark)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def mkdirs(path: str, spark: SparkSession | None = None) -> None:
    fs, p = _fs_path(path, spark)
    fs.mkdirs(p)


def delete(path: str, recursive: bool = True,
           spark: SparkSession | None = None) -> bool:
    """Recursive delete; returns whether anything was removed.  The
    object-store analogue of the reference's bucket prefix deletion
    (locate/deletion.go:105-169)."""
    fs, p = _fs_path(path, spark)
    return bool(fs.delete(p, bool(recursive)))


def glob(pattern: str, spark: SparkSession | None = None) -> list[str]:
    """Qualified URI strings matching a Hadoop glob pattern (one LIST per
    wildcard level — same cost shape as the reference's bucket Iter)."""
    fs, p = _fs_path(pattern, spark)
    statuses = fs.globStatus(p)
    if statuses is None:
        return []
    return sorted(str(s.getPath()) for s in statuses)
