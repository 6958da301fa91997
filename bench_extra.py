"""Extra benchmark harness for optimization work (round 6).

NOT the frozen driver bench (bench.py).  This one runs an arbitrary subset
of the declared queries with the noop sink, N runs each, and prints a
per-query JSON map — used for A/B isolation per spark_optimization_guide §1.

Usage:
    python bench_extra.py [--sf DIR] [--runs N] [--queries a,b,c | --all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_quality_monitoring_spark.entry_queries import QUERIES  # noqa: E402
from data_quality_monitoring_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--warmup", default="", help="query to run once untimed first")
    args = ap.parse_args()

    if args.all:
        from bench import HEADLINE

        names = HEADLINE
    else:
        names = [q for q in args.queries.split(",") if q]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="dqm_bench_extra",
        cores=cpus,
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    if args.warmup:
        QUERIES[args.warmup](spark, args.sf).write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        ts = []
        for _ in range(args.runs):
            t0 = time.time()
            QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = ts
        print(json.dumps({name: ts}), flush=True)
    best = {k: min(v) for k, v in out.items()}
    print(json.dumps({"sf": args.sf, "total_best": round(sum(best.values()), 3), "best": best}))


if __name__ == "__main__":
    main()
