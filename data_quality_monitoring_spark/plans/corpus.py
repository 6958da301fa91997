"""End-to-end training-corpus build: filter → dedup → cluster → sample.

The complete path a 100-TB web-text corpus takes through this engine,
composed from the individually-tested operators:

1. ``quality_filter`` — rules + pattern + langid + perplexity → keep/drop
   verdict + scrubbed text (shuffle-free scan stage),
2. exact dedup on the scrubbed bytes (one groupBy on a 128-bit hash),
3. near-dup removal: MinHash signatures → LSH band candidates → exact
   Jaccard verify → connected components → keep the component's min-key
   doc (`operators/dedup.py` end to end; every join is an equi-join on a
   bucket or pair key, never all-pairs),
4. optional deterministic stratified down-sampling per language
   (`operators/sampling.py` — idempotent md5-bucket gate).

Scale notes: stages 1–2 touch every doc; stage 3's joins run on the pair
list (orders of magnitude smaller); stage 4 is another scan-local gate.
The output co-exists with ``sources/manifest.PartitionedSink`` for
bucket-committed, resumable writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    connected_components,
    exact_dedup,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
)
from ..operators.sampling import stratified_sample
from .pipeline import quality_filter


def build_corpus(
    spark: SparkSession,
    pages: DataFrame,
    jaccard_threshold: float = 0.7,
    sample_rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
) -> tuple[DataFrame, dict]:
    """Returns (corpus_df[url, lang, text_scrubbed], stage-counts dict).

    Stage counts come from the cached intermediates the next stage consumes
    (docs_in is a parquet metadata count — no data scan)."""
    filtered = quality_filter(spark, pages)
    kept = (
        filtered.filter(F.col("keep"))
        .select("url", "lang", F.col("text_scrubbed"))
        .persist()
    )
    n_kept = kept.count()  # materializes the cache for every later stage

    deduped = exact_dedup(kept, "url", "text_scrubbed").persist()
    n_exact = deduped.count()
    kept.unpersist()  # deduped is materialized; nothing reads kept again

    sig = minhash_signatures(deduped, "url", "text_scrubbed")
    cand = lsh_candidate_pairs(sig, "url")
    pairs = jaccard_verify(deduped, cand, "url", "text_scrubbed", jaccard_threshold)
    comp = connected_components(pairs, "a", "b")
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("url")
    )
    uniq = deduped.join(losers, "url", "left_anti")

    if sample_rates is not None:
        corpus = stratified_sample(uniq, "url", "lang", sample_rates, default_rate)
    else:
        corpus = uniq
    # deduped stays cached: the returned plan reads it (caller unpersists
    # via corpus.sparkSession.catalog.clearCache() or after the final write)
    n_final = corpus.count()
    return corpus, {
        "docs_in": pages.count(),
        "kept": n_kept,
        "after_exact_dedup": n_exact,
        "final": n_final,
    }
