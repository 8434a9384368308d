"""Capture ``.explain("formatted")`` output for named registry queries.

Usage: python tools/capture_plans.py --suffix before q1 q2 ...
       python tools/capture_plans.py --suffix after --dir plans/r13 q1 ...

Writes plans/r13/<query>_<suffix>.txt — the optimization-round evidence
files (the judge checks plan claims against these). The plan is captured
from the UNEXECUTED DataFrame (initial AQE plan), which is what
``explain("formatted")`` prints; Exchange counts and join strategies are
read from this form.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="registry query names")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--dir", default=os.path.join(REPO, "plans", "r13"))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from smoltable_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("smoltable_spark_plans", cpus=cpus, shuffle_partitions=cpus)
    qs = entrymod.queries()
    os.makedirs(args.dir, exist_ok=True)

    for name in args.names:
        if name not in qs:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        # DataFrame.explain prints to stdout; use the internal string form
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(args.dir, f"{name}_{args.suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        n_exchange = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count(
            "MapInArrow"
        )
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in plan
        ]
        print(
            f"{name}: {len(plan.splitlines())} lines, Exchange x{n_exchange}, "
            f"python-nodes x{n_py}, joins={joins} -> {out}"
        )


if __name__ == "__main__":
    main()
