"""10x-data core-scaling rows (VERDICT r13 ask #8): run the top-band
registry queries against the 10x replica (.scale_data, built by
tools/scale_smoke.py) at BOTH core counts the driver uses (8 and 32),
one fresh Spark session per (cores, pass), interleaved 32/8/32/8 so VM
drift hits both arms. Appends a "## 10x core-scaling" section to
SCALE.md (scale_smoke preserves hand-appended sections).

Evidence goal: demonstrate which heavy rows genuinely parallelize once
data outweighs the local commit/fsync floor — the driver's 8-vs-32
scaling block reads ~1.0 at sf0.1 because the suite is floor-dominated
there, not because $SPARK_GRAFT_CPUS is ignored.

Usage: python tools/scale_cores.py [--queries a,b,c] [--passes 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.path.join(REPO, ".scale_data")

DEFAULT = [
    "rel_triangle_count",
    "dedup_stream_admit",
    "dedup_containment",
    "rel_entity_clusters",
    "ann_ivf_readd",
]


def run_once(names: list[str], cpus: int) -> dict[str, float]:
    """One fresh session at `cpus`; returns per-query seconds."""
    from smoltable_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(f"scale_cores_{cpus}", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"scale_cores[{cpus}] {name}")
        t0 = time.time()
        qs[name](spark, DATA).count()
        out[name] = time.time() - t0
        print(f"  cpus={cpus} {name}: {out[name]:.3f}s", file=sys.stderr)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT))
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    names = [s for s in args.queries.split(",") if s]
    if not os.path.isdir(DATA):
        print("run tools/scale_smoke.py first (builds .scale_data)",
              file=sys.stderr)
        sys.exit(1)

    import subprocess

    # fresh process per session: local[32] and local[8] must not share a
    # JVM, and interleaving 32/8 per pass spreads VM drift across arms
    results: dict[int, dict[str, list[float]]] = {32: {}, 8: {}}
    for p in range(args.passes):
        for cpus in (32, 8):
            r = subprocess.run(
                [sys.executable, __file__, "--_worker", str(cpus),
                 "--queries", ",".join(names)],
                capture_output=True, text=True,
            )
            if r.returncode != 0:
                print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
                sys.exit(1)
            for line in r.stdout.splitlines():
                name, sec = line.split("\t")
                results[cpus].setdefault(name, []).append(float(sec))
            print(f"pass {p} cpus={cpus} done", file=sys.stderr)

    lines = [
        "## 10x core-scaling (VERDICT r13 ask #8; min over "
        f"{args.passes} interleaved passes, fresh session per arm)",
        "",
        "| query (at 10x data) | 32 cores s | 8 cores s | ratio 8/32 |",
        "|---|---|---|---|",
    ]
    for name in names:
        a = min(results[32][name])
        b = min(results[8][name])
        lines.append(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f} |")
    block = "\n".join(lines) + "\n"
    scale_path = os.path.join(REPO, "SCALE.md")
    text = open(scale_path).read()
    marker = "## 10x core-scaling"
    if marker in text:
        head, _, rest = text.partition(marker)
        _, _, after = rest.partition("\n## ")
        text = head + block + ("\n## " + after if after else "")
    else:
        text = text.rstrip() + "\n\n" + block
    open(scale_path, "w").write(text)
    print("updated SCALE.md", file=sys.stderr)


if __name__ == "__main__":
    if "--_worker" in sys.argv:
        i = sys.argv.index("--_worker")
        cpus = int(sys.argv[i + 1])
        qi = sys.argv.index("--queries")
        names = sys.argv[qi + 1].split(",")
        out = run_once(names, cpus)
        for name, sec in out.items():
            print(f"{name}\t{sec}")
    else:
        main()
