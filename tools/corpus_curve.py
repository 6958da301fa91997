"""Corpus-build size curve with per-stage attribution.

Runs the `plans/corpus.build_corpus` pipeline stage-by-stage (each stage
persisted + counted so its wall is attributable, the profiling method from
round 2) at a ladder of corpus sizes, printing one line per (size, stage).
The question this answers: which stage owns the superlinear tail as the
synthetic near-dup junk families grow with N, and does the LSH bucket cap
keep the candidate/verify stages near-linear.

Usage: python tools/corpus_curve.py [sizes_csv] [cpus] [max_bucket] [min_est]
       e.g. python tools/corpus_curve.py 1000000,2000000,4000000,8000000 32 500
       min_est (optional, e.g. 0.375) enables the signature prefilter
       between banding and verify (operators/dedup.signature_prefilter).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sizes = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "1000000").split(",")]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    max_bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    min_est = float(sys.argv[4]) if len(sys.argv) > 4 else None

    from data_quality_monitoring_spark.datagen import generate_pages
    from data_quality_monitoring_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        signature_prefilter,
    )
    from data_quality_monitoring_spark.plans.pipeline import quality_filter
    from data_quality_monitoring_spark.session import get_spark

    spark = get_spark(cores=cpus, extra_conf={"spark.ui.showConsoleProgress": "false"})

    def steal() -> int:
        f = open("/proc/stat").readline().split()
        return int(f[8])

    for n in sizes:
        s0, t_all = steal(), time.time()
        walls: dict[str, float] = {}

        def stage(name: str, df, persist: bool = True):
            t0 = time.time()
            if persist:
                df = df.persist()
            c = df.count()
            walls[name] = time.time() - t0
            print(f"  n={n} stage={name}: {walls[name]:.1f}s rows={c}", flush=True)
            return df

        pages = generate_pages(spark, n, partitions=max(cpus * 4, 64))
        kept = stage(
            "filter",
            quality_filter(spark, pages)
            .filter(F.col("keep"))
            .select("url", "lang", "text_scrubbed"),
        )
        deduped = stage("exact_dedup", exact_dedup(kept, "url", "text_scrubbed"))
        kept.unpersist()
        sig = stage("minhash_sig", minhash_signatures(deduped, "url", "text_scrubbed"))
        cand = stage(
            "lsh_candidates", lsh_candidate_pairs(sig, "url", max_bucket=max_bucket)
        )
        if min_est is not None:
            cand = stage("sig_prefilter", signature_prefilter(sig, cand, "url", min_est=min_est))
        sig.unpersist()
        pairs = stage(
            "jaccard_verify", jaccard_verify(deduped, cand, "url", "text_scrubbed", 0.7)
        )
        cand.unpersist()
        t0 = time.time()
        comp = connected_components(pairs, "a", "b")
        losers = comp.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("url")
        )
        final = deduped.join(losers, "url", "left_anti").count()
        walls["cc_keepone"] = time.time() - t0
        pairs.unpersist()
        deduped.unpersist()
        total = time.time() - t_all
        print(
            f"TOTAL n={n}: {total:.1f}s ({n/total:.0f} docs/s) final={final} "
            f"stages={ {k: round(v,1) for k,v in walls.items()} } "
            f"steal_delta={steal()-s0}",
            flush=True,
        )


if __name__ == "__main__":
    main()
