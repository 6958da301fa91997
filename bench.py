"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Primary metric: total wall seconds over the headline set (the driver
records this per round).  Also reported: docs/sec of the flagship
quality-filter pipeline — the BASELINE.json throughput number.

Usage:
    python bench.py                      # sf0.1, all CPUs the env names
    SPARK_GRAFT_CPUS=8 python bench.py   # for scaling-efficiency runs
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_quality_monitoring_spark.entry_queries import QUERIES  # noqa: E402
from data_quality_monitoring_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pipeline_verdict",  # flagship: full quality filter (rules+pattern+ml+llm+scrub)
    "pipeline_rules_verdict",  # oracled flagship slice (validation+pattern)
    "pipeline_verdict_full",  # FULL 4-family flagship, oracled (round 3)
    "rule_firsthit",
    "extract_text",  # html→text, pure codegen chain
    "scrub_pii",
    "dedup_minhash",
    "dedup_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_substring",  # ExactSubstr window-coverage dedup (round 3)
    "line_dedup",
    "decontamination",
    "sequence_packing",
    "sequence_packing_bpe",  # tokenizer-faithful budgets (round 3)
    "langid_scores",  # in-query distributed NB train + Arrow score (round 3)
    "perplexity_scores",  # in-query distributed bigram-LM train + score (round 3)
    "perplexity_buckets",  # CCNet head/middle/tail tiers (round 3)
    "perplexity_trigram",  # higher-order KenLM-style tier (round 3, late)
    "url_canonical",  # codegen-only crawl-dedup key (round 3)
    "corpus_mixture",  # source-weighted token-budget assembly (round 3)
    "host_pagerank",  # iterative link-graph reputation (round 3)
    "host_quality",  # RefinedWeb host blocklist aggregation (round 3)
    "link_edges",  # html→outlink host edges, pure codegen (round 3)
    "anchor_terms",  # anchor-text reputation signal (round 3, late)
    "tfidf_terms",  # per-doc tf-idf keywords (round 3, late)
    "shuffled_shards",  # global training-shard shuffle (round 3)
    "pack_texts",  # loader-ready pack materialization (round 3)
    "noindex_pages",  # robots-meta opt-out detection (round 3)
    "embedding_near_dup",
    "semantic_dedup",  # SemDeDup cluster-prune (round 3, late)
    "fuzzy_decontamination",  # minhash eval-leak decontamination (round 3, late)
    "dsir_sample",  # DSIR importance resampling (round 3, late)
    "pack_token_ids",  # loader-final token-id pack streams (round 3, late)
    "chunk_documents",  # context-window chunking, pure codegen (round 3, late)
    "repetition_stats",
    "normalize_unicode",
    "multifield_cells",
    "similarity_topk",
    "centroid_similarity",
    "events_hourly",
    "events_sessionize",
    "tpch_q1",
    "revenue_by_nation",
    "llm_tier_verdict",  # optional LLM tiers: dynamic/prototype/ICL (round 4)
    "decontamination_bloom",  # fixed-size eval broadcast (round 4)
    "audio_features",  # real stdlib WAV decode via mapInPandas (round 4)
    "gopher_rules",  # Gopher hard-rule gate, pure codegen (round 4)
    "c4_clean",  # C4 line-level cleaner, pure codegen (round 4)
    "dedup_keep_best",  # quality-priority cluster retention (round 4)
    "gopher_repetition",  # full Gopher repetition family, 1 Arrow pass (round 4)
    "hp_sweep",  # 18-config hyperparameter sweep, train-once one-pass (round 5)
    "hp_sweep_ml",  # ML-slot (NB alpha) sweep, shared count aggregation (round 5)
    "contamination_stats",  # PaLM-style per-doc eval-overlap audit (round 5)
]


def _steal_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — the hypervisor-steal counter.

    This host shows 10-25% bursty steal (BENCH.md); reporting the measured
    steal fraction alongside the timings makes a cross-round slowdown
    attributable: a uniform shift with high steal_pct is the shared bus,
    not a plan regression (VERDICT r3 task 2)."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


STEAL_GATE_PCT = 1.0  # a "clean" window: <1% hypervisor steal
MAX_RUNS_PER_QUERY = 6


def run_query(spark, name: str, sf_dir: str) -> tuple[float, float, int]:
    """Best-of-N with a STEAL-GATED retry (VERDICT r4 task 2).

    Each run measures its own /proc/stat steal window.  Min-of-3 is the
    base protocol; if even the fastest run's window saw >= STEAL_GATE_PCT
    steal, the minimum is still contaminated (a burst longer than one
    best-of-3 window — the r4 artifact's 1.91x flagship reading), so keep
    re-running up to MAX_RUNS_PER_QUERY until one clean-window run exists.
    Returns (best seconds, that run's steal %, runs used) — the recorded
    number carries its own evidence either way."""

    def once() -> tuple[float, float]:
        s0, j0 = _steal_ticks()
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        s1, j1 = _steal_ticks()
        stl = 100.0 * (s1 - s0) / (j1 - j0) if j1 > j0 else 0.0
        return dt, stl

    runs = [once() for _ in range(3)]
    while (
        min(runs)[1] >= STEAL_GATE_PCT and len(runs) < MAX_RUNS_PER_QUERY
    ):
        runs.append(once())
    best = min(runs)
    return best[0], best[1], len(runs)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(
        app_name="dqm_bench",
        cores=cpus,
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # warm up the JVM + python workers + model artifacts once
    run_query(spark, "pipeline_verdict", sf_dir)

    steal0, total0 = _steal_ticks()
    timings: dict[str, float] = {}
    query_steal: dict[str, float] = {}
    query_runs: dict[str, int] = {}
    for name in HEADLINE:
        t, stl, n = run_query(spark, name, sf_dir)
        timings[name] = round(t, 3)
        query_steal[name] = round(stl, 2)
        query_runs[name] = n
    # the flagship sets the headline docs/s: re-measure it at the END of
    # the battery too — a shared-bus burst localized at the start of the
    # run (measured 3.6x inflation on this host) can't wreck the one
    # number cross-round comparisons hang on.  Both placements are
    # reported raw; queries["pipeline_verdict"] stays protocol-consistent
    # (min-of-3 at battery start) so per-query cross-round deltas compare
    # like with like, and docs/s takes the min of the two placements.
    flagship_end, flagship_end_steal, _ = run_query(spark, "pipeline_verdict", sf_dir)
    flagship_end = round(flagship_end, 3)
    steal1, total1 = _steal_ticks()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (total1 - total0), 2)
        if total1 > total0
        else None
    )

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / min(timings["pipeline_verdict"], flagship_end), 1)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_docs": n_docs,
                "pipeline_docs_per_sec": docs_per_sec,
                "pipeline_verdict_end_sec": flagship_end,
                "flagship_runs": 6,
                "runs_per_query": 3,
                "steal_pct": steal_pct,
                # per-query: steal % inside the RECORDED (fastest) run's
                # window + how many runs the steal gate needed; a recorded
                # number with steal < 1% is regression-comparable on its own
                "query_steal_pct": query_steal,
                "query_runs": query_runs,
                "steal_gate_pct": STEAL_GATE_PCT,
            }
        )
    )


if __name__ == "__main__":
    main()
