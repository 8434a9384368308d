"""Dump the physical-plan audit for every registry query.

Usage: python tools/audit_plans.py [--sf DIR] [--only name,...]

For each query prints pushed filters, partition filters, broadcast/shuffle
counts, and codegen spans — the scale properties the engine promises
(see smoltable_spark/plans/explain.py). Useful for eyeballing whether a
new operator regressed into a full scan or an extra shuffle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from smoltable_spark import plans
    from smoltable_spark.session import get_spark

    spark = get_spark("audit_plans", cpus=8)
    only = set(args.only.split(",")) if args.only else None
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, args.sf)
            a = plans.audit(df)
            a.pop("read_schemas", None)
            print(name, json.dumps(a))
        except Exception as e:
            print(name, "ERROR", str(e).splitlines()[0][:120])
    spark.stop()


if __name__ == "__main__":
    main()
