"""Scale-shape measurement for the selection/dedup tier added late in
round 3: SemDeDup, fuzzy decontamination and DSIR at ~1M rows.

Each operator's claim is a SHAPE claim, so each measurement prints the
evidence for it alongside the wall:

* semantic_dedup — pairwise work is bounded by cell size: we report the
  max/mean cell occupancy and the implied pair count actually evaluated.
* fuzzy_decontaminate — corpus cost is two shingle passes and never a
  self-join: we scale the corpus 10x while the eval set stays fixed and
  report the wall ratio (should be ~linear).
* dsir_sample — everything but two feature scans + one scoring scan is
  bounded by n_buckets: we report wall per 1M docs.

Usage: python tools/selection_bench.py [n_docs] [n_vecs] [cpus] [ops]
(``ops`` = comma list from semantic,fuzzy,dsir; default all)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from data_quality_monitoring_spark.datagen import generate_pages  # noqa: E402
from data_quality_monitoring_spark.session import get_spark  # noqa: E402

DIM = 64


def gen_vectors(spark, n: int, partitions: int = 64):
    """Deterministic clustered vectors: 256 seed directions + noise, plus
    an exact-twin family every 1000 ids (real semantic dups to find)."""
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches):
        seeds = np.random.default_rng(11).normal(size=(256, DIM))
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) if len(ids) else 0)
            base = seeds[ids % 256]
            # background noise keeps same-cluster cosine ~0.8 (below the
            # 0.95 dedup bar); twins sit at ~0.999 (real semantic dups)
            v = base + rng.normal(size=base.shape) * 0.5
            twin = ids % 1000 == 1
            v[twin] = seeds[(ids[twin] - 1) % 256] + 0.01
            yield pd.DataFrame({"vec_id": ids, "embedding": list(v)})

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, schema)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    ops = set((sys.argv[4] if len(sys.argv) > 4 else "semantic,fuzzy,dsir").split(","))
    spark = get_spark(cores=cpus, extra_conf={"spark.ui.showConsoleProgress": "false"})
    out: dict = {"n_docs": n_docs, "n_vecs": n_vecs, "cpus": cpus}

    # ---------------- semantic_dedup
    if "semantic" in ops:
        _bench_semantic(spark, n_vecs, out)
    if "fuzzy" in ops:
        _bench_fuzzy(spark, n_docs, out)
    if "dsir" in ops:
        _bench_dsir(spark, n_docs, out)
    print(json.dumps(out))


def _bench_semantic(spark, n_vecs: int, out: dict) -> None:
    from data_quality_monitoring_spark.operators.similarity import (
        semantic_dedup,
        train_centroids,
    )

    vecs = gen_vectors(spark, n_vecs).persist()
    vecs.count()
    n_cells = max(256, n_vecs // 128)  # target ~128 vectors per cell
    cents = train_centroids(vecs, "embedding", n_cells=min(n_cells, 8192), iters=3)
    t0 = time.time()
    res = semantic_dedup(vecs, "vec_id", "embedding", cents, threshold=0.95,
                         max_cell=4096)
    kept = res.filter("keep = 1").count()
    wall = time.time() - t0
    occ = (
        res.groupBy("cell").count().agg(
            F.max("count").alias("mx"), F.avg("count").alias("avg"),
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
        ).first()
    )
    out["semantic_dedup"] = {
        "wall_s": round(wall, 1),
        "kept": kept,
        "dropped": n_vecs - kept,
        "n_cells": int(min(n_cells, 8192)),
        "max_cell_occupancy": int(occ["mx"]),
        "mean_cell_occupancy": round(float(occ["avg"]), 1),
        "pairs_evaluated": int(occ["pairs"]),
        "pairs_all_pairs_would_be": n_vecs * (n_vecs - 1) // 2,
    }
    print(json.dumps({"semantic_dedup": out["semantic_dedup"]}))
    vecs.unpersist()


def _bench_fuzzy(spark, n_docs: int, out: dict) -> None:
    # corpus 0.1x then 1x, fixed eval set
    from data_quality_monitoring_spark.operators.dedup import fuzzy_decontaminate

    eval_set = (
        generate_pages(spark, 1000, partitions=4)
        .select(F.col("url").alias("bid"), F.col("text"))
        .persist()
    )
    eval_set.count()
    walls = {}
    for frac, n in (("small", n_docs // 10), ("large", n_docs)):
        docs = generate_pages(spark, n, partitions=64).select("url", "text")
        t0 = time.time()
        hits = fuzzy_decontaminate(docs, eval_set, "url", "bid", threshold=0.5).count()
        walls[frac] = (time.time() - t0, hits, n)
    out["fuzzy_decontaminate"] = {
        "eval_docs": 1000,
        "small": {"n": walls["small"][2], "wall_s": round(walls["small"][0], 1),
                   "hits": walls["small"][1]},
        "large": {"n": walls["large"][2], "wall_s": round(walls["large"][0], 1),
                   "hits": walls["large"][1]},
        "wall_ratio_for_10x_docs": round(walls["large"][0] / walls["small"][0], 2),
    }
    print(json.dumps({"fuzzy_decontaminate": out["fuzzy_decontaminate"]}))
    eval_set.unpersist()


def _bench_dsir(spark, n_docs: int, out: dict) -> None:
    from data_quality_monitoring_spark.operators.sampling import dsir_sample

    docs = generate_pages(spark, n_docs, partitions=64).select(
        "url", "lang", "text"
    ).persist()
    docs.count()
    target = docs.filter(F.col("lang") == "en")
    t0 = time.time()
    picked = dsir_sample(docs, target, "url", n=n_docs // 10)
    n_sel = picked.count()
    wall = time.time() - t0
    out["dsir_sample"] = {
        "wall_s": round(wall, 1),
        "selected": n_sel,
        "docs_per_sec": int(n_docs / wall),
    }
    print(json.dumps({"dsir_sample": out["dsir_sample"]}))
    docs.unpersist()


if __name__ == "__main__":
    main()
