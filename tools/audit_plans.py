"""Dump the physical-plan audit for every registry query.

Usage: python tools/audit_plans.py [--sf DIR] [--only name,...] [--write]

For each query prints pushed filters, partition filters, broadcast/shuffle
counts, and codegen spans — the scale properties the engine promises
(see smoltable_spark/plans/explain.py). Useful for eyeballing whether a
new operator regressed into a full scan or an extra shuffle.

``--write`` regenerates PLANS.md in place: the prose header above the
fenced block is preserved, the fenced body is rebuilt in registry order.
With ``--only`` the audited rows are merged into the existing body
(other rows kept); without, the body is replaced wholesale. This
replaces the old stdout-capture-and-reassemble workflow, which left
PLANS.md stale whenever the reassembly step was forgotten.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLANS_PATH = os.path.join(REPO, "PLANS.md")


def rewrite_plans_md(rows: dict[str, str], order: list[str], merge: bool) -> None:
    """Replace (or merge into) the fenced body of PLANS.md, keeping the
    prose header and writing atomically."""
    with open(PLANS_PATH) as fh:
        text = fh.read()
    open_at = text.index("```")
    close_at = text.rindex("```")
    if open_at == close_at:
        raise SystemExit("PLANS.md: fenced block not found")
    header = text[: open_at + 3]
    tail = text[close_at:]
    if merge:
        for line in text[open_at + 3 : close_at].splitlines():
            line = line.strip()
            if line:
                name = line.split(" ", 1)[0]
                rows.setdefault(name, line.split(" ", 1)[1] if " " in line else "")
    body = "\n".join(f"{n} {rows[n]}" for n in order if n in rows)
    stray = sorted(set(rows) - set(order))
    if stray:  # audited rows for queries no longer registered
        body += "".join(f"\n{n} {rows[n]}" for n in stray)
    tmp = PLANS_PATH + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(header + "\n" + body + "\n" + tail)
    os.replace(tmp, PLANS_PATH)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--write",
        action="store_true",
        help="regenerate PLANS.md's fenced body (merge when --only is set)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from smoltable_spark import plans
    from smoltable_spark.session import get_spark

    spark = get_spark("audit_plans", cpus=8)
    only = set(args.only.split(",")) if args.only else None
    rows: dict[str, str] = {}
    order = list(entrymod.queries())
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, args.sf)
            a = plans.audit(df)
            a.pop("read_schemas", None)
            rows[name] = json.dumps(a)
            print(name, rows[name])
        except Exception as e:
            print(name, "ERROR", str(e).splitlines()[0][:120])
    spark.stop()
    if args.write:
        rewrite_plans_md(rows, order, merge=only is not None)
        print(f"# wrote {len(rows)} rows into PLANS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
