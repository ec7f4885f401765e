"""Pluggable commit-log IO for the snapshot table (Delta-LogStore
pattern).

The snapshot/manifest machinery in `sources/layout.py` needs five
small-file primitives from its backing store: read, overwrite-write,
list, delete, and — the one that carries the whole commit protocol —
an ATOMIC EXCLUSIVE write ("publish this manifest iff no one else
has"). Object stores and filesystems differ in which primitive is
atomic, which is exactly why Delta routes its `_delta_log` IO through
a per-scheme LogStore (HDFSLogStore / S3SingleDriverLogStore / ...)
instead of calling any one filesystem API directly. Same shape here:

- :class:`LocalLogStore` — plain ``os`` calls for scheme-less local
  paths. Exclusive-write = write a temp sibling (content complete,
  fsynced) then ``os.link`` it into place: ``link(2)`` fails with
  EEXIST atomically in the kernel, so two racing committers can never
  both publish one version, and a reader can never observe a
  half-written manifest (the name appears only after the bytes are
  durable).
- :class:`HadoopLogStore` — any URI Spark's Hadoop configuration can
  resolve (``file:``, ``hdfs:``, ``s3a:``, ...), driven through
  ``org.apache.hadoop.fs.FileSystem`` / ``FileContext`` over py4j.
  Exclusive-write = temp file + ``FileContext.rename(src, dst,
  Options.Rename.NONE)`` — the no-overwrite rename Delta's
  HDFSLogStore uses; atomic on HDFS. On stores whose rename is
  not atomic-exclusive (raw S3 without a coordination layer), the
  same caveat as Delta applies: single active committer, or front it
  with a coordination service. That caveat is the scheme's, not the
  protocol's — which is the point of the interface.

``logstore_for`` dispatches on the root path's scheme, mirroring
Delta's ``LogStoreProvider``.
"""

from __future__ import annotations

import os
import uuid


class CommitConflict(Exception):
    """Another committer published this path first (CAS loss)."""


class LocalLogStore:
    """``os``-based store for scheme-less local paths."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, content: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
        os.replace(tmp, path)

    def write_text_exclusive(self, path: str, content: str) -> None:
        """Atomic all-or-nothing publish: content lands under a temp
        name first, then link(2) claims the final name — EEXIST loses
        the race. No reader ever sees partial content; no two writers
        ever both succeed."""
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflict(path)
        finally:
            os.remove(tmp)

    def list_dir(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def delete(self, path: str, recursive: bool = False) -> None:
        import shutil

        try:
            if recursive and os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
        except FileNotFoundError:
            pass

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def rename(self, src: str, dst: str) -> None:
        """Move a file or directory; dst must not exist (or be an
        empty dir for directory moves)."""
        os.replace(src, dst)

    def mtime(self, path: str) -> float | None:
        try:
            return os.stat(path).st_mtime
        except FileNotFoundError:
            return None

    def size(self, path: str) -> int | None:
        try:
            return os.stat(path).st_size
        except FileNotFoundError:
            return None


class HadoopLogStore:
    """Hadoop-FileSystem store: one impl for every scheme the cluster's
    ``core-site.xml`` can resolve. All calls go through the SAME
    Hadoop conf Spark's own reads/writes use, so manifest IO and data
    IO agree about credentials, endpoints and schemes."""

    def __init__(self, spark, root: str):
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._gw = sc._gateway
        self._conf = sc._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(self._conf)
        # FileContext.rename(.., Rename.NONE) = fail-if-destination-
        # exists, the CAS primitive (Delta HDFSLogStore's choice)
        self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._fs.getUri(), self._conf
        )
        Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
        self._rename_none = self._gw.new_array(Rename, 1)
        self._rename_none[0] = Rename.NONE
        self._rename_overwrite = self._gw.new_array(Rename, 1)
        self._rename_overwrite[0] = Rename.OVERWRITE

    # -- helpers

    def _is_missing(self, jerr) -> bool:
        name = jerr.java_exception.getClass().getName()
        return "FileNotFound" in name or "PathNotFound" in name

    def read_text(self, path: str) -> str:
        from py4j.protocol import Py4JJavaError

        try:
            stream = self._fs.open(self._Path(path))
        except Py4JJavaError as e:
            if self._is_missing(e):
                raise FileNotFoundError(path)
            raise
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return data

    def _write_raw(self, path: str, content: str) -> None:
        out = self._fs.create(self._Path(path), True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()

    def write_text(self, path: str, content: str) -> None:
        """Atomic overwrite: tmp sibling + ``FileContext.rename(..,
        OVERWRITE)`` (atomic on HDFS), matching LocalLogStore's
        ``os.replace`` — a crash mid-write can leave a stray tmp file
        but never a truncated destination (consumers' cursor files
        depend on this)."""
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        self._write_raw(tmp, content)
        try:
            self._fc.rename(
                self._Path(tmp), self._Path(path), self._rename_overwrite
            )
        except Exception:
            self.delete(tmp)
            raise

    def write_text_exclusive(self, path: str, content: str) -> None:
        from py4j.protocol import Py4JJavaError

        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        self._write_raw(tmp, content)
        try:
            self._fc.rename(self._Path(tmp), self._Path(path), self._rename_none)
        except Py4JJavaError as e:
            self.delete(tmp)
            name = e.java_exception.getClass().getName()
            if "AlreadyExists" in name or "FileAlreadyExists" in name:
                raise CommitConflict(path)
            raise

    def list_dir(self, path: str) -> list[str]:
        from py4j.protocol import Py4JJavaError

        try:
            statuses = self._fs.listStatus(self._Path(path))
        except Py4JJavaError as e:
            if self._is_missing(e):
                return []
            raise
        return [st.getPath().getName() for st in statuses]

    def delete(self, path: str, recursive: bool = False) -> None:
        self._fs.delete(self._Path(path), recursive)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._Path(path))

    def rename(self, src: str, dst: str) -> None:
        """Move a file or directory; dst must not exist (Rename.NONE
        fails atomically if it does)."""
        self._fc.rename(self._Path(src), self._Path(dst), self._rename_none)

    def mtime(self, path: str) -> float | None:
        from py4j.protocol import Py4JJavaError

        try:
            return self._fs.getFileStatus(self._Path(path)).getModificationTime() / 1000.0
        except Py4JJavaError as e:
            if self._is_missing(e):
                return None
            raise

    def size(self, path: str) -> int | None:
        from py4j.protocol import Py4JJavaError

        try:
            return self._fs.getFileStatus(self._Path(path)).getLen()
        except Py4JJavaError as e:
            if self._is_missing(e):
                return None
            raise


def logstore_for(spark, root: str):
    """Scheme dispatch, mirroring Delta's LogStoreProvider: a bare
    path gets the in-process local store (true O_EXCL atomicity, no
    JVM hop per call); any URI scheme — ``file:`` included — routes
    through Hadoop's FileSystem so the table can live wherever the
    cluster's Hadoop conf points (HDFS, S3A, ABFS, ...)."""
    if "://" in root or root.startswith("file:"):
        return HadoopLogStore(spark, root)
    return LocalLogStore()
