"""Per-family throughput attribution — reproduces the BENCH.md table that
mirrors the reference's per-family characterization (BASELINE.md).

Each detector family runs alone through ``quality_filter(methods=[...])``
over the seeded synthetic corpus (noop sink, best of 2 after a warm-up), so
the numbers decompose the same way the reference documents its latencies.

Usage: python tools/family_bench.py [n_docs] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_quality_monitoring_spark.datagen import generate_pages  # noqa: E402
from data_quality_monitoring_spark.plans.pipeline import quality_filter  # noqa: E402
from data_quality_monitoring_spark.session import get_spark  # noqa: E402

FAMILIES = [
    ["validation"],
    ["pattern"],
    ["ml"],
    ["llm"],
    ["validation", "pattern", "ml", "llm"],
]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        app_name="dqm_family_bench",
        cores=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    pages = generate_pages(spark, n_docs, partitions=max(cpus * 2, 8)).persist()
    pages.count()

    out: dict[str, dict] = {}
    for methods in FAMILIES:
        def once() -> float:
            t0 = time.time()
            quality_filter(spark, pages, methods=methods).write.format(
                "noop"
            ).mode("overwrite").save()
            return time.time() - t0

        once()  # warm: JVM, python workers, model artifacts
        wall = min(once(), once())
        out["+".join(methods)] = {
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1),
            "us_per_doc": round(1e6 * wall / n_docs, 2),
        }
    print(json.dumps({"n_docs": n_docs, "cpus": cpus, "families": out}))


if __name__ == "__main__":
    main()
