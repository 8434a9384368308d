"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, sorted column names, and the
order-insensitive multiset of values (exact — the engine's queries are
designed for bit-exact cross-engine results; see queries_util.py).

A fully-green query refreshes its stamp in ORACLE_LEDGER.json (see
tools/oracle_ledger.py) — the staleness-proof record that THIS exact
source+oracle combination passed the oracle check.

Usage: python tools/check_oracle.py [--sf DIR] [--only name1,name2]
       [--no-ledger] [-v]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from collections import Counter
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    """Type-STRICT normalization mirroring the driver's typed hasher.

    The driver hashes values together with their Arrow type, so a DuckDB
    HUGEINT/DECIMAL column (Arrow decimal128) never matches a Spark LONG
    even when every value is numerically equal.  Round 3 shipped exactly
    that bug because this function used to collapse Decimal -> float; now
    each scalar carries a type tag, so the local gate red-flags what the
    driver red-flags.  bytes/bytearray share a tag (both become Arrow
    binary driver-side).
    """
    if isinstance(v, bool):
        return f"bool:{v!r}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:NaN"
        return "float:" + repr(v)  # full precision — exactness is the contract
    if isinstance(v, Decimal):
        return "decimal:" + str(v)
    if isinstance(v, (bytes, bytearray)):
        return "bytes:" + bytes(v).hex()
    if hasattr(v, "asDict"):  # pyspark Row (nested struct) — Row subclasses
        v = v.asDict()        # tuple, so this MUST precede the tuple branch
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{norm_value(x)}" for k, x in sorted(v.items())
        ) + "}"
    return repr(v)


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--no-ledger", action="store_true",
                    help="do not refresh ORACLE_LEDGER.json stamps")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    import duckdb
    import __spark_entry__ as entrymod
    from smoltable_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_ok = n_fail = n_weak = 0
    failures = []
    passed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(srows)} (no oracle — rows-only check)")
            n_weak += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            failures.append(name)
            continue
        dt = time.time() - t0
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm = row_multiset([tuple(r) for r in srows], scols)
            om = row_multiset(orows, ocols)
            if sm != om:
                diff_s = list((sm - om).items())[:3]
                diff_o = list((om - sm).items())[:3]
                problems.append(f"values spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
            failures.append(name)
        else:
            print(f"OK   {name}: rows={len(srows)} ({dt:.1f}s)")
            n_ok += 1
            passed.append(name)

    print(f"\n== {n_ok} ok, {n_weak} weak (rows-only), {n_fail} fail ==")
    if failures:
        print("failures:", ",".join(failures))
    if passed and not args.no_ledger:
        import datetime
        from tools.oracle_ledger import record_green

        record_green(
            passed, args.sf,
            datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"),
            {n: (qs[n], oracles.get(n)) for n in qs},
        )
        print(f"ledger: refreshed {len(passed)} stamps in ORACLE_LEDGER.json")
        if not only:  # full run: keep the staleness table current too
            from tools.oracle_ledger import write_coverage_section

            worst = write_coverage_section()
            print(f"COVERAGE.md staleness refreshed (max {worst} rounds)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
