"""Incremental-dedup store scaling: batch cost vs store size, per layout.

Measures the wall time of one fixed-size batch through
``plans.corpus.incremental_dedup`` against a small store and a 10× store,
for the plain parquet layout vs the bucketed catalog layout
(``sources/sigstore.py``).  The number that matters is the RATIO
batch(10×store)/batch(1×store) — how fast per-batch cost grows as the
accepted corpus accumulates (round-2 baseline: 2.9× on the parquet layout).

Usage: python tools/sigstore_bench.py [batch_docs] [store_docs] [cpus] [mode]

mode=synthetic (default): unique 40-word docs — isolates store-side scan/
shuffle cost (no candidate pairs survive banding).
mode=datagen: filtered datagen pages (the round-2 measurement's corpus) —
docs carry real near-dup families, so the verify stage joins the store's
shingle arrays and the store-side shuffle actually bites.  batch/store
sizes are then PAGE counts (≈55% survive the filter).
"""

from __future__ import annotations

import shutil
import sys
import time
import uuid
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_docs(spark, n: int, id_offset: int):
    """Deterministic docs with enough word variety for real shingle work."""
    words = [
        F.concat(F.lit("w"), F.pmod(F.xxhash64(F.lit(i), F.col("id")), F.lit(5000)))
        for i in range(40)
    ]
    return spark.range(id_offset, id_offset + n).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.concat_ws(" ", *words).alias("text_scrubbed"),
    )


def datagen_docs(spark, n_pages: int, id_offset: int):
    """Filtered datagen pages, the round-2 measurement's corpus shape
    (near-dup junk families, variable lengths, real shingle arrays)."""
    from data_quality_monitoring_spark.datagen import generate_pages
    from data_quality_monitoring_spark.plans.pipeline import quality_filter

    pages = generate_pages(
        spark, n_pages, partitions=64, id_offset=id_offset
    )
    return (
        quality_filter(spark, pages)
        .filter(F.col("keep"))
        .select("url", "text_scrubbed")
        .localCheckpoint(eager=True)
    )


def main() -> None:
    batch_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    store_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    mode = sys.argv[4] if len(sys.argv) > 4 else "synthetic"

    from data_quality_monitoring_spark.plans.corpus import incremental_dedup
    from data_quality_monitoring_spark.session import get_spark
    from data_quality_monitoring_spark.sources.sigstore import BucketedSigStore

    spark = get_spark(cores=cpus, extra_conf={"spark.ui.showConsoleProgress": "false"})

    def make_docs(n: int, id_offset: int):
        if mode == "datagen":
            return datagen_docs(spark, n, id_offset)
        return synth_docs(spark, n, id_offset)
    results: dict[str, dict[int, float]] = {}
    for layout in ("parquet", "bucketed"):
        results[layout] = {}
        for mult in (1, 10):
            n_store = store_docs * mult
            if layout == "parquet":
                path = Path(f"/tmp/sigbench_{uuid.uuid4().hex[:8]}")
                store = str(path)
            else:
                store = BucketedSigStore("sigbench_" + uuid.uuid4().hex[:8])
            # seed the store (not timed): one big accepted batch
            incremental_dedup(spark, make_docs(n_store, 0), store)
            # timed: a fresh batch against the populated store, best of 2
            best = float("inf")
            for trial in range(2):
                t0 = time.time()
                _, stats = incremental_dedup(
                    spark,
                    make_docs(batch_docs, 10_000_000 + trial * batch_docs),
                    store,
                )
                best = min(best, time.time() - t0)
            results[layout][mult] = best
            print(
                f"{layout} store={n_store}: batch({batch_docs}) = {best:.2f}s "
                f"(accepted {stats['accepted']})",
                flush=True,
            )
            if layout == "parquet":
                shutil.rmtree(store, ignore_errors=True)
    for layout, r in results.items():
        print(f"{layout}: 10x-store cost ratio = {r[10] / r[1]:.2f}x")


if __name__ == "__main__":
    main()
