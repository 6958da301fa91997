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


def incremental_dedup(
    spark: SparkSession,
    new_docs: DataFrame,
    sig_store: str,
    key: str = "url",
    text_col: str = "text_scrubbed",
    jaccard_threshold: float = 0.7,
) -> tuple[DataFrame, dict]:
    """Dedup a NEW batch against an existing corpus without touching the
    old data: the production shape for incremental crawls (a new
    Common-Crawl dump lands monthly; re-running all-pairs over the whole
    history would be quadratic in dumps).

    ``sig_store`` is a parquet dir of the accepted corpus's minhash
    signatures (plus an exact-content hash).  Per batch:

    1. drop new docs whose exact hash already exists (broadcast-friendly
       semi-join on the 128-bit hash — never on text),
    2. LSH-candidate only (new × all) and (new × new) pairs — old × old
       pairs are pruned BEFORE the join by marking sides, so batch cost
       scales with the batch, not the corpus,
    3. exact-Jaccard verify needs both sides' text; the store keeps no
       old text, so verification joins the OLD side's shingle-hash arrays
       persisted alongside the signatures (8-byte hashes, not text),
    4. survivors' signatures are appended to the store — the next batch
       sees them.

    Size note: the store carries per-doc shingle-hash arrays (~8 B per
    distinct shingle, comparable to the text itself) because exact-Jaccard
    verification needs both sides' sets.  At extreme scale, either accept
    band-level candidates without verification (store shrinks to the 8
    minhashes + content hash per doc) or keep the old corpus readable by
    key and join text on demand — the candidate-generation shape is the
    same in all three configurations.

    Returns (accepted_new_docs, stats).
    """
    from pathlib import Path

    from ..operators.dedup import minhash_signatures, shingle_column

    sig_cols = [f"h{i}" for i in range(8)]
    new_sig = (
        minhash_signatures(new_docs, key, text_col)
        .join(
            new_docs.select(
                key,
                F.md5(F.col(text_col)).alias("content_hash"),
                F.transform(
                    shingle_column(F.col(text_col)), lambda x: F.xxhash64(x)
                ).alias("shingles"),
            ),
            key,
        )
    )

    store = Path(sig_store)
    if store.exists():
        old = spark.read.parquet(sig_store)
        # 1. exact: drop new docs whose content already exists
        new_sig = new_sig.join(
            old.select("content_hash"), "content_hash", "left_anti"
        )
        # 2-3. near-dup: candidates via shared LSH bands where at least one
        # side is new; verify on stored shingle hashes
        both = old.select(key, *sig_cols, "shingles").withColumn(
            "is_new", F.lit(False)
        ).unionByName(
            new_sig.select(key, *sig_cols, "shingles").withColumn("is_new", F.lit(True))
        )
        bands = [
            F.xxhash64(F.lit(i), F.col(f"h{2*i}"), F.col(f"h{2*i+1}")).alias(f"b{i}")
            for i in range(4)
        ]
        banded = both.select(key, "is_new", "shingles", *bands)
        buckets = banded.select(
            key, "is_new", "shingles",
            F.expr("stack(4, 0, b0, 1, b1, 2, b2, 3, b3) as (band, bucket)"),
        )
        a, b = buckets.alias("a"), buckets.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{key}") < F.col(f"b.{key}"))
                # old×old pairs were settled in previous batches
                & (F.col("a.is_new") | F.col("b.is_new")),
            )
            .withColumn(
                "_inter",
                F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles"))),
            )
            .withColumn(
                "jaccard",
                F.col("_inter")
                / (
                    F.size(F.col("a.shingles")) + F.size(F.col("b.shingles"))
                    - F.col("_inter")
                ),
            )
            .filter(F.col("jaccard") >= jaccard_threshold)
        )
        # a new doc loses to ANY old near-dup, and within new×new pairs the
        # min key wins (same keep-one rule as build_corpus)
        losers = (
            pairs.select(
                F.when(F.col("a.is_new") & ~F.col("b.is_new"), F.col(f"a.{key}"))
                .when(F.col("b.is_new") & ~F.col("a.is_new"), F.col(f"b.{key}"))
                .otherwise(F.greatest(F.col(f"a.{key}"), F.col(f"b.{key}")))
                .alias(key)
            )
            .distinct()
        )
        accepted_sig = new_sig.join(losers, key, "left_anti")
    else:
        accepted_sig = new_sig

    # MATERIALIZE (lineage-truncating) before mutating the store: the plan
    # reads sig_store, and appending to it then lazily re-evaluating would
    # make the batch's own signatures look like pre-existing dups and
    # silently drop every accepted doc (a persist() is NOT enough — an
    # unpersist or executor eviction re-runs the plan against the mutated
    # input).  At cluster scale this would be a write to a staging table;
    # localCheckpoint is the single-app equivalent.
    accepted_sig = accepted_sig.localCheckpoint(eager=True)

    n_in = new_docs.count()
    n_accepted = accepted_sig.count()
    accepted_sig.select(key, *sig_cols, "content_hash", "shingles").write.mode(
        "append"
    ).parquet(sig_store)
    accepted = new_docs.join(accepted_sig.select(key), key, "left_semi")
    return accepted, {"batch_in": n_in, "accepted": n_accepted, "dropped": n_in - n_accepted}
