"""Round-13 pins: the generation-commit CAS (VERDICT r12 ask #1) and the
degraded-pointer resolution paths (ADVICE r12).

- ``create_exclusive`` is an atomic create-if-absent on BOTH adapters
  (``open(..., 'x')`` locally; ``FileSystem.create(path, overwrite=false)``
  through the JVM), raising Python ``FileExistsError`` uniformly.
- ``_commit_version`` on a rename-unsafe filesystem publishes through
  that CAS: two writers racing to the same generation get exactly one
  winner and a loud :class:`ConcurrentCommitError`, never a silent
  last-writer-wins (the r12 protocol's lost-update window).
- A TORN newest generation (crashed writer on a flush-visible scheme,
  e.g. wasb/abfs) is pre-commit garbage: readers fall back to the
  next-lower parsable generation and the next commit sweeps the file.
- A generation vacuumed between a reader's listing and its read
  (fast-moving writers + aggressive retention) re-lists and retries
  instead of propagating FileNotFoundError.
"""

from __future__ import annotations

import json
import os

import pytest

from smoltable_spark.api import ColumnFamilyDef
from smoltable_spark.sources.store import ConcurrentCommitError
from smoltable_spark.sources.store_fs import HadoopStoreFS, LocalStoreFS

from tests.conftest import make_cells
from tests.test_round12 import RenameUnsafeFS, _append, _unsafe_store


# ---------------------------------------------------------------------------
# create_exclusive: the CAS primitive


def test_create_exclusive_local(tmp_path):
    fs = LocalStoreFS()
    p = str(tmp_path / "k")
    fs.create_exclusive(p, "one")
    assert fs.read_text(p) == "one"
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, "two")
    assert fs.read_text(p) == "one"  # the loser never mutated the winner


def test_create_exclusive_jvm(spark, tmp_path, mkuri):
    base = mkuri(tmp_path)
    fs = HadoopStoreFS(spark, base)
    p = base + "/k"
    fs.create_exclusive(p, "one")
    assert fs.read_text(p) == "one"
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, "two")
    assert fs.read_text(p) == "one"


# ---------------------------------------------------------------------------
# generation-commit CAS: one winner, loud loser


def test_generation_commit_conflict_is_loud(spark, tmp_path):
    a = _unsafe_store(spark, tmp_path / "t")
    a.save_families([ColumnFamilyDef("f")])
    _append(spark, a, "a")
    b = _unsafe_store(spark, tmp_path / "t")
    # both writers resolve the same next generation, then race the CAS
    n = a.current_version() + 1
    assert b.current_version() + 1 == n
    a._commit_version(n)
    with pytest.raises(ConcurrentCommitError, match=f"v{n}"):
        b._commit_version(n)
    # the winner's pointer content is intact
    fresh = _unsafe_store(spark, tmp_path / "t")
    assert fresh.current_version() == n


def test_append_after_conflict_recovers(spark, tmp_path):
    s = _unsafe_store(spark, tmp_path / "t")
    s.save_families([ColumnFamilyDef("f")])
    _append(spark, s, "a")
    # a foreign writer publishes the generation this handle would use
    other = _unsafe_store(spark, tmp_path / "t")
    other._commit_version(other.current_version() + 1)
    # the next append re-resolves current_version() at commit time, so it
    # lands on a FRESH generation, not a conflict
    _append(spark, s, "b")
    assert s.current_version() == 3


# ---------------------------------------------------------------------------
# torn newest generation: fall back, then sweep


def test_torn_newest_generation_falls_back(spark, tmp_path):
    s = _unsafe_store(spark, tmp_path / "t")
    s.save_families([ColumnFamilyDef("f")])
    _append(spark, s, "a")
    _append(spark, s, "b")
    assert s.current_version() == 2
    # a crashed writer on a flush-visible scheme left half a pointer
    torn = os.path.join(s.path, "_VERSION-v3")
    with open(torn, "w") as fh:
        fh.write('{"v": 3, "le')  # truncated mid-JSON
    fresh = _unsafe_store(spark, tmp_path / "t")
    assert fresh.current_version() == 2  # garbage is not a commit
    assert fresh.read().count() == 2
    # the next commit sweeps the garbage and takes the generation
    _append(spark, fresh, "c")
    assert fresh.current_version() == 3
    got = json.loads(fresh._fs.read_text(torn))
    assert got["v"] == 3  # the torn file was replaced by a real commit


def test_torn_generation_below_a_real_commit_is_skipped(spark, tmp_path):
    s = _unsafe_store(spark, tmp_path / "t")
    s.save_families([ColumnFamilyDef("f")])
    _append(spark, s, "a")
    _append(spark, s, "b")
    # corrupt the OLDER generation; the max is intact and must win
    with open(os.path.join(s.path, "_VERSION-v1"), "w") as fh:
        fh.write("garbage")
    fresh = _unsafe_store(spark, tmp_path / "t")
    assert fresh.current_version() == 2


# ---------------------------------------------------------------------------
# vacuum race: the listed max vanishes before the read


class _VacuumRacingFS(RenameUnsafeFS):
    """Simulates the ADVICE r12 interleaving: between this reader's
    generation listing and its read of the listed max, other writers
    commit newer generations and vacuum sweeps the listed one."""

    def __init__(self):
        super().__init__()
        self.raced = False

    def read_text(self, p: str) -> str:
        if not self.raced and os.path.basename(p) == "_VERSION-v2":
            self.raced = True
            root = os.path.dirname(p)
            os.remove(p)
            with open(os.path.join(root, "_VERSION-v3"), "w") as fh:
                fh.write(json.dumps({"v": 3, "legs": {}}))
            raise FileNotFoundError(p)
        return super().read_text(p)


def test_vacuum_race_relists_and_retries(spark, tmp_path):
    s = _unsafe_store(spark, tmp_path / "t")
    s.save_families([ColumnFamilyDef("f")])
    _append(spark, s, "a")
    _append(spark, s, "b")
    racer = _unsafe_store(spark, tmp_path / "t")
    racer._fs = _VacuumRacingFS()
    # first read of the listed max (v2) hits the sweep; the retry must
    # resolve the newer generation the racing writer left behind
    assert racer.current_version() == 3
    assert racer._fs.raced


# ---------------------------------------------------------------------------
# unified bare-path dispatch (VERDICT r12 ask #6 / ADVICE r12 medium)


def test_bare_path_dispatch_follows_default_fs(spark, tmp_path):
    """Both adapters resolve a bare path the way Spark's data plane
    does: against ``fs.defaultFS``. With a non-local defaultFS (here a
    viewfs mount) the SAME bare string must address the SAME filesystem
    through both adapters — pre-r13, the store/index metadata went to
    the driver's local disk while the data plane wrote to defaultFS."""
    from smoltable_spark.sources.hadoop_fs import HadoopFS, LocalFS, fs_for
    from smoltable_spark.sources.store_fs import store_fs_for

    hc = spark._jsc.hadoopConfiguration()
    old = hc.get("fs.defaultFS", "file:///")
    hc.set(
        "fs.viewfs.mounttable.dfx.link./s", "file://" + str(tmp_path)
    )
    hc.set("fs.defaultFS", "viewfs://dfx/")
    try:
        sfs = store_fs_for(spark, "/s/store")
        afs = fs_for(spark, "/s/store")
        assert isinstance(sfs, HadoopStoreFS)
        assert isinstance(afs, HadoopFS)
        # identical resolution: a file created through one adapter is
        # visible through the other AND physically under the mount target
        sfs.write_text("/s/probe.txt", "x")
        assert afs.exists("/s/probe.txt")
        assert (tmp_path / "probe.txt").exists()
        assert sfs.scheme == afs.scheme == "viewfs"
    finally:
        hc.set("fs.defaultFS", old)
    # local defaultFS: both keep the zero-JVM fast path
    assert isinstance(store_fs_for(spark, str(tmp_path)), LocalStoreFS)
    assert isinstance(fs_for(spark, str(tmp_path)), LocalFS)
