"""1M-doc throughput of the Gopher repetition gate (VERDICT r5 item 4).

Reproduces the round-5 BENCH.md protocol exactly: 1M ``generate_pages``
docs, local[32], persisted input, 3 timed trials of the in-place
``rep_keep`` gate (filter + count — the count is the action and yields the
keep rate).  Prints one JSON line.

Usage: python tools/repgate_bench.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from data_quality_monitoring_spark.datagen import generate_pages  # noqa: E402
from data_quality_monitoring_spark.operators.textstats import (  # noqa: E402
    gopher_repetition_col,
)
from data_quality_monitoring_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        app_name="dqm_repgate_bench",
        cores=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    pages = generate_pages(spark, n_docs, partitions=max(cpus * 2, 8)).persist()
    pages.count()
    spark.sparkContext.setJobDescription("repgate_bench")

    gated = pages.filter(gopher_repetition_col(F.col("text"))["rep_keep"])
    kept = gated.count()  # warm-up (JVM + Arrow workers) + keep rate
    walls = []
    for _ in range(3):
        t0 = time.time()
        gated.count()
        walls.append(round(time.time() - t0, 3))
    best = min(walls)
    print(
        json.dumps(
            {
                "op": "rep_gate",
                "n_docs": n_docs,
                "cpus": cpus,
                "kept": kept,
                "keep_rate": round(kept / n_docs, 4),
                "walls_sec": walls,
                "best_sec": best,
                "docs_per_sec": round(n_docs / best, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
