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
    min_est_jaccard: float | None = None,
    keep_best: bool = False,
) -> tuple[DataFrame, dict]:
    """Returns (corpus_df[url, lang, text_scrubbed], stage-counts dict).

    Stage counts come from the cached intermediates the next stage consumes
    (docs_in is a parquet metadata count — no data scan).

    ``min_est_jaccard`` (opt-in) inserts the minhash-agreement prefilter
    between banding and exact verify — the guard for low-entropy corpora
    where banding false-positive pairs grow superlinearly (see
    operators/dedup.signature_prefilter for the recall math).

    ``keep_best`` (opt-in) switches near-dup cluster retention from
    keep-min-key to keep-highest-quality-score (NemoCurator/FineWeb
    policy; operators/dedup.component_keep_best, score =
    textstats.quality_score on the scrubbed text)."""
    from ..operators.dedup import signature_prefilter

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
    if min_est_jaccard is not None:
        cand = signature_prefilter(sig, cand, "url", min_est=min_est_jaccard)
    pairs = jaccard_verify(deduped, cand, "url", "text_scrubbed", jaccard_threshold)
    comp = connected_components(pairs, "a", "b")
    if keep_best:
        from ..operators.dedup import component_keep_best
        from ..operators.textstats import quality_score_df

        # staged form: splits the text 2x total, not once per signal
        scored = quality_score_df(
            deduped, "text_scrubbed", out_col="_q"
        ).select("url", "_q")
        losers = (
            component_keep_best(comp, scored, "url", "_q")
            .filter(~F.col("is_retained"))
            .select(F.col("node").alias("url"))
        )
    else:
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
    max_bucket: int = 500,
    accepted_writer=None,
) -> tuple[DataFrame, dict]:
    """Dedup a NEW batch against an existing corpus without touching the
    old data: the production shape for incremental crawls (a new
    Common-Crawl dump lands monthly; re-running all-pairs over the whole
    history would be quadratic in dumps).

    ``sig_store`` is a parquet dir of the accepted corpus's per-doc
    features: 8 minhashes, the 128-bit content hash, and the xxhash64'd
    shingle set.  Per batch:

    0. within-batch exact keep-one (min key per content — so the very
       FIRST batch already dedups internally),
    1. drop new docs whose exact content hash exists in the store,
    2. LSH band candidates with the NEW side only on the left of the
       join — old×old pairs never enumerate, so batch cost is
       O(batch × bucket occupancy), not O(corpus); oversized buckets are
       capped exactly like ``lsh_candidate_pairs``'s max_bucket guard,
    3. distinct candidate pairs verify by exact Jaccard over the stored
       shingle-hash sets (8-byte hashes, never old text),
    4. keep-one matches ``build_corpus``: a new doc with ANY old verified
       partner loses; new×new pairs go through connected components and
       each component keeps its min key,
    5. ``accepted_writer(accepted_docs)`` (if given) runs BEFORE the
       signature append, so a crash between the two re-runs cleanly —
       appending signatures first would make a re-run see the batch's own
       rows as pre-existing dups and silently lose it.  The writer should
       be idempotent per batch (e.g. overwrite a batch-id partition).

    Features are computed in ONE pass per doc (no explode/groupBy
    shuffle: minhashes are array-min over seeded rehashes of the shingle
    set).  Docs with fewer than 3 words have no shingles; they skip the
    near-dup stage but still flow through exact dedup and acceptance.

    Size note: the store carries per-doc shingle-hash arrays (~8 B per
    distinct shingle, comparable to the text itself) because exact-Jaccard
    verification needs both sides' sets.  At extreme scale, either accept
    band-level candidates without verification (store shrinks to the 8
    minhashes + content hash per doc) or keep the old corpus readable by
    key and join text on demand — the candidate-generation shape is the
    same in all three configurations.

    ``sig_store`` is either a parquet dir path (``ParquetSigStore``) or any
    store object from ``sources.sigstore`` — ``BucketedSigStore`` keeps each
    join's store side bucketed on its join key so per-batch shuffle volume
    stops growing with the store (see that module's docstring).

    Returns (accepted_new_docs, stats).
    """
    from pathlib import Path

    from ..operators.dedup import shingle_column
    from ..sources.sigstore import ParquetSigStore, banded_from_sig

    n_in = new_docs.count()
    new_docs = exact_dedup(new_docs, key, text_col)  # within-batch keep-one

    sig_cols = [f"h{i}" for i in range(8)]
    feat = new_docs.select(
        key,
        F.md5(F.col(text_col)).alias("content_hash"),
        F.transform(shingle_column(F.col(text_col)), lambda x: F.xxhash64(x)).alias(
            "shingles"
        ),
    )
    def _seeded(b: int):
        # MUST be a one-parameter lambda: pyspark treats a two-parameter
        # transform lambda as (element, index) — a `lambda s, b=b:` default
        # captured the index column as the seed and made the minhash
        # order-dependent (0/8 shared hashes on an 0.87-Jaccard pair)
        return lambda s: F.xxhash64(F.lit(b), s)

    new_sig = feat.withColumns(
        {f"h{b}": F.array_min(F.transform(F.col("shingles"), _seeded(b))) for b in range(8)}
    )

    store = (
        ParquetSigStore(str(sig_store))
        if isinstance(sig_store, (str, Path))
        else sig_store
    )
    if store.exists(spark):
        old = store.sig(spark)
        new_sig = new_sig.join(store.hashes(spark), "content_hash", "left_anti")
        old_b = store.bands(spark, key).withColumn("is_new", F.lit(False))
        census = store.census(spark)
    else:
        old = spark.createDataFrame([], new_sig.schema)
        old_b = banded_from_sig(old, key).withColumn("is_new", F.lit(False))
        census = None

    new_b = banded_from_sig(new_sig, key).withColumn("is_new", F.lit(True))
    all_b = old_b.unionByName(new_b)
    # hot-bucket cap (same guard + rationale as lsh_candidate_pairs); with a
    # census-keeping store the count comes from the incremental partials
    # plus this batch instead of re-counting the store's band stream
    if census is None:
        totals = all_b.groupBy("band", "bucket").agg(F.count("*").alias("_n"))
    else:
        totals = (
            census.select("band", "bucket", F.col("n").alias("_n"))
            .unionByName(
                new_b.groupBy("band", "bucket").agg(F.count("*").alias("_n"))
            )
            .groupBy("band", "bucket")
            .agg(F.sum("_n").alias("_n"))
        )
    hot = totals.filter(F.col("_n") > max_bucket).select("band", "bucket")
    new_b = new_b.join(hot, ["band", "bucket"], "left_anti")
    all_b = all_b.join(hot, ["band", "bucket"], "left_anti")

    a, b = new_b.alias("a"), all_b.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            # old partner: any; new partner: unordered pair once
            & (~F.col("b.is_new") | (F.col(f"a.{key}") < F.col(f"b.{key}")))
            & (F.col(f"a.{key}") != F.col(f"b.{key}")),
        )
        .select(
            F.col(f"a.{key}").alias("na"), F.col(f"b.{key}").alias("nb"),
            F.col("b.is_new").alias("partner_is_new"),
        )
        .distinct()  # multi-band collisions verify once
    )
    sh = old.select(key, "shingles").unionByName(new_sig.select(key, "shingles"))
    verified = (
        pairs.join(sh.withColumnRenamed(key, "na").withColumnRenamed("shingles", "_sa"), "na")
        .join(sh.withColumnRenamed(key, "nb").withColumnRenamed("shingles", "_sb"), "nb")
        .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.size("_sa") + F.size("_sb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("na", "nb", "partner_is_new")
    )
    # keep-one, build_corpus semantics
    old_losers = verified.filter(~F.col("partner_is_new")).select(F.col("na").alias(key))
    nn = verified.filter(F.col("partner_is_new"))
    comp = connected_components(nn.select(F.col("na").alias("a"), F.col("nb").alias("b")), "a", "b")
    cc_losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(key)
    )
    losers = old_losers.unionByName(cc_losers).distinct()
    accepted_sig = new_sig.join(losers, key, "left_anti")

    # MATERIALIZE (lineage-truncating) before mutating the store: the plan
    # reads sig_store, and appending to it then lazily re-evaluating would
    # make the batch's own signatures look like pre-existing dups and
    # silently drop every accepted doc (a persist() is NOT enough — an
    # unpersist or executor eviction re-runs the plan against the mutated
    # input).  At cluster scale this would be a write to a staging table;
    # localCheckpoint is the single-app equivalent.
    accepted_sig = accepted_sig.localCheckpoint(eager=True)

    n_accepted = accepted_sig.count()
    accepted = new_docs.join(accepted_sig.select(key), key, "left_semi")
    if accepted_writer is not None:  # corpus lands before the store moves
        accepted_writer(accepted)
    store.append(spark, accepted_sig, key)
    return accepted, {"batch_in": n_in, "accepted": n_accepted, "dropped": n_in - n_accepted}
