"""Micro-bench for VERDICT r11 ask #7: driver-side metadata cost of
OPENING a CellStore chain on a URI store (Py4J + FS RPCs), as a
function of chain length, with the r12 pointer chain-manifest vs the
legacy plain-int pointer (which forces the per-leg _KIND/_FOLDS walk).

Builds file:-URI stores with N delta legs, then times a fresh handle's
metadata resolution only (current_version + _legs_of + per-leg kind and
folds) — no Spark read. Prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _resolve(store) -> None:
    cur = store.current_version()
    legs = store._legs_of(cur)
    for v in legs:
        store._kind(v)
        store._folds_of(v)


def main() -> None:
    from smoltable_spark.session import get_spark
    from smoltable_spark.api import ColumnFamilyDef
    from smoltable_spark.sources.store import CellStore
    from tests.conftest import make_cells

    spark = get_spark("uri_open_bench", cpus=4, shuffle_partitions=4)
    base = tempfile.mkdtemp(prefix="uri_open_bench_")
    out: dict[str, dict[str, float]] = {}
    for chain in (1, 8, 32):
        path = f"{base}/chain{chain}"
        s = CellStore(spark, "file:" + path)
        s.save_families([ColumnFamilyDef("f")])
        for i in range(chain):
            s.append(
                make_cells(spark, [(f"k{i}", "f", "", 1, "string", "v")])
            )
        res: dict[str, float] = {}
        for mode in ("manifest", "legacy"):
            if mode == "legacy":
                # rewrite to the pre-r12 plain-int pointer: every open
                # falls back to the per-leg marker walk. The JVM
                # LocalFileSystem is checksummed, so the out-of-band
                # local write must drop the stale .crc sidecar too.
                with open(os.path.join(path, "_VERSION"), "w") as fh:
                    fh.write(str(chain))
                crc = os.path.join(path, "._VERSION.crc")
                if os.path.exists(crc):
                    os.remove(crc)
            times = []
            for _ in range(5):
                fresh = CellStore(spark, "file:" + path)
                t0 = time.perf_counter()
                _resolve(fresh)
                times.append(time.perf_counter() - t0)
            res[mode] = round(min(times) * 1000, 2)  # ms
        out[f"chain_{chain}"] = res
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"uri_open_ms_min_of_5": out}))


if __name__ == "__main__":
    main()
