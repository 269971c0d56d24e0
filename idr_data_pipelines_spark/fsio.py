"""Driver-side small-file I/O on WHATEVER filesystem a path names.

The engine keeps a handful of tiny driver-written control files next
to Spark-written data: the ``_state_commit`` version pointer and the
``_HLL_B`` geometry sidecar (streaming/events.py), and the Catalog's
existence probe (sources/catalog.py). Plain ``os`` calls silently
no-op for every ``hdfs:// s3a:// gs://`` path — the classic
driver-local-probe bug (r11/r12 reviews) — so all of them route
through the Hadoop FileSystem via the JVM gateway, exactly the
filesystem stack Spark itself resolves the path with.

Fallback contract (same as ``Catalog._path_exists``): the local
``os`` implementation is used ONLY when the JVM gateway is
unavailable (Spark Connect — correct there, since Connect clients
pass local/driver-visible paths). Genuine FileSystem errors (auth,
network, permission) PROPAGATE; swallowing them into the local
fallback would turn a transient DFS failure into "file absent" and
silently reset state.

The atomic pointer flip uses ``FileContext.rename(..., OVERWRITE)``
— atomic on HDFS and local filesystems, the direct analogue of
``os.replace``. Object stores without atomic rename (S3) keep the
documented caveat: use a path on a real filesystem for state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def _gateway(spark: SparkSession):
    """(jvm, gateway, hadoopConf) or None when no JVM gateway exists
    (Spark Connect). Only gateway ABSENCE triggers the local
    fallback; anything the Hadoop stack raises afterwards is a real
    filesystem error and must reach the caller."""
    try:
        sc = spark.sparkContext
        jvm = sc._jvm
        gw = sc._gateway
        jsc = sc._jsc
    except Exception:
        return None
    if jvm is None or jsc is None:
        return None
    return jvm, gw, jsc.hadoopConfiguration()


def _fs_path(spark: SparkSession, path: str):
    """(fs, jpath, jvm, gw) for gateway mode, else None."""
    g = _gateway(spark)
    if g is None:
        return None
    jvm, gw, conf = g
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    # Qualify up front (r12 ADVICE): the atomic rename mixes
    # FileSystem (create) with FileContext (rename), and for a
    # RELATIVE path the two resolve against different working
    # directories (FileSystem: process cwd; FileContext: user home).
    # A qualified path is absolute in both stacks.
    return fs, fs.makeQualified(jpath), jvm, gw


def exists(spark: SparkSession, path: str) -> bool:
    r = _fs_path(spark, path)
    if r is None:
        return os.path.exists(path)
    fs, jpath, _, _ = r
    return bool(fs.exists(jpath))


def mkdirs(spark: SparkSession, path: str) -> None:
    r = _fs_path(spark, path)
    if r is None:
        os.makedirs(path, exist_ok=True)
        return
    fs, jpath, _, _ = r
    fs.mkdirs(jpath)


def read_text(spark: SparkSession, path: str) -> str | None:
    """File contents as UTF-8, or None when the file does not exist
    (the one error class callers treat as data — 'no pointer yet')."""
    r = _fs_path(spark, path)
    if r is None:
        try:
            with open(path) as fh:
                return fh.read()
        except FileNotFoundError:
            return None
    fs, jpath, jvm, _ = r
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()


def write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Write-temp-then-rename(OVERWRITE): readers only ever observe a
    fully-written file — the ``os.replace`` contract, on whatever
    filesystem ``path`` names (FileContext.rename is atomic on HDFS
    and local FS; object stores keep their documented caveat)."""
    r = _fs_path(spark, path)
    if r is None:
        # same contract as the gateway path (fs.mkdirs(parent)
        # below): the parent directory is created, not assumed
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = os.path.join(
            os.path.dirname(path), f".{os.path.basename(path)}.tmp"
        )
        with open(tmp, "w") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    fs, jpath, jvm, gw = r
    parent = jpath.getParent()
    fs.mkdirs(parent)
    jtmp = jvm.org.apache.hadoop.fs.Path(
        parent, f".{jpath.getName()}.tmp"
    )
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        jpath.toUri(), fs.getConf()
    )
    overwrite = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
    overwrite[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(jtmp, jpath, overwrite)


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory (empty when absent)."""
    r = _fs_path(spark, path)
    if r is None:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []
    fs, jpath, _, _ = r
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def delete(spark: SparkSession, path: str, recursive: bool = True) -> None:
    """Best-effort-shaped delete of a path that may not exist (maps
    to the GC use: removing superseded state-version directories)."""
    r = _fs_path(spark, path)
    if r is None:
        # match the gateway path's semantics (fs.delete removes files
        # AND directories): rmtree(ignore_errors) silently no-ops on a
        # regular file (r12 ADVICE)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
        return
    fs, jpath, _, _ = r
    if fs.exists(jpath):
        fs.delete(jpath, recursive)
