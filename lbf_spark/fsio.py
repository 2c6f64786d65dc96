"""Filesystem-agnostic small-file IO via Hadoop's FileSystem API.

Checkpoint and table manifests must keep working when the directory is
``hdfs://`` / ``s3a://`` — plain ``os.*`` calls only understand POSIX
paths, which is fine in a sandbox and broken on the 1000-executor
cluster this engine targets. Every helper here resolves the path's
``FileSystem`` from the session's Hadoop configuration, so bare local
paths, ``file:`` URIs and DFS URIs all behave identically (the same
mechanism Spark's own checkpoint/_SUCCESS machinery uses).

Only tiny JSON manifests flow through these helpers — data always moves
through ``df.write.parquet`` — so the py4j byte-shuttling cost is nil.
"""

from __future__ import annotations

import posixpath


def join(*parts: str) -> str:
    """URI-safe path join (os.path.join would also work on POSIX, but
    this never surprises on a scheme-prefixed base)."""
    return posixpath.join(*parts)


def _fs_path(spark, path_str: str):
    if spark is None:
        raise ValueError(
            "fsio needs an active SparkSession to reach the Hadoop "
            f"FileSystem API (path: {path_str}); create one first"
        )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    return jpath.getFileSystem(hconf), jpath, jvm


def exists(spark, path: str) -> bool:
    fs, p, _ = _fs_path(spark, path)
    return bool(fs.exists(p))


def read_text(spark, path: str) -> str:
    fs, p, jvm = _fs_path(spark, path)
    stream = fs.open(p)
    try:
        # commons-io ships with Spark; one call avoids a py4j read loop
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(spark, path: str, text: str) -> None:
    """Write via a temp file + rename — readers never observe a partial
    manifest (rename is atomic on HDFS/POSIX; on S3A it is copy+delete,
    still yielding only all-or-nothing object visibility)."""
    fs, p, jvm = _fs_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(p):  # HDFS rename refuses to clobber
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise IOError(f"rename {path}.tmp -> {path} failed")


def list_names(spark, path: str) -> list[str]:
    """Immediate children's names (no recursion), [] for a missing dir."""
    fs, p, _ = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


def list_files_recursive(spark, path: str, suffix: str) -> list[dict]:
    """All files under ``path`` with that suffix, as
    {path (relative), bytes} — FS metadata only, no data read."""
    fs, p, _ = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    base = str(fs.makeQualified(p).toUri().getPath())
    it = fs.listFiles(p, True)
    out = []
    while it.hasNext():
        st = it.next()
        full = str(st.getPath().toUri().getPath())
        if full.endswith(suffix):
            rel = full[len(base):].lstrip("/") if full.startswith(base) else full
            out.append({"path": rel, "bytes": int(st.getLen())})
    return sorted(out, key=lambda d: d["path"])


def count_files_recursive(spark, path: str, suffix: str) -> int:
    fs, p, _ = _fs_path(spark, path)
    if not fs.exists(p):
        return 0
    it = fs.listFiles(p, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            n += 1
    return n


def mkdirs(spark, path: str) -> None:
    fs, p, _ = _fs_path(spark, path)
    fs.mkdirs(p)
