"""Sequence packing: assign documents to fixed token-budget packs.

The standard pre-training batching step (T5/GPT data pipelines): concatenate
documents until a token budget (e.g. 2048) fills, start the next pack.  The
exact greedy recurrence ("start a new pack when adding would overflow") is
sequential and does not distribute; the standard scalable form is OFFSET
packing — order documents deterministically, take the running token sum, and
assign each document to ``floor(start_offset / budget)``.  A pack's token
total can then exceed the budget by at most one document's length (callers
cap/split over-long docs upstream), and the whole thing is a window
expression: embarrassingly parallel across (group, shard) partitions and
bit-reproducible anywhere.

Scale design: the window partitions on ``(group_cols…, shard)`` where shard
is the md5-derived bucket of the key (``sampling.sample_bucket`` — portable
to the DuckDB oracle, unlike xxhash64).  n_shards bounds every sort to
corpus/n_shards rows, so at 10¹² documents packing is n_shards independent
sorted windows per group, each a single map-side-sortable partition — no
global sort anywhere.

Determinism: ordering inside a shard is by the row key, the shard is a pure
function of the key, and token counts are pure column functions — the pack
assignment is invariant to input partitioning and retries (tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import sample_bucket
from .textstats import token_count


def pack_documents(
    df: DataFrame,
    key: str,
    budget: int,
    text_col: str = "text",
    group_cols: tuple[str, ...] = (),
    n_shards: int = 16,
    tokens_col: str | None = None,
    cheap_filter: Column | None = None,
) -> DataFrame:
    """Add ``shard``, ``n_tokens``, ``pack_id`` (and pass through
    ``group_cols``) to every row with a non-empty token count.

    ``tokens_col`` reuses a precomputed count column; otherwise whitespace
    ``token_count(text_col)`` is used.  ``pack_id`` numbers packs within
    each (group, shard) partition from 0.

    ``cheap_filter`` (only with ``tokens_col``): a scan-cheap predicate the
    caller GUARANTEES is equivalent to ``n_tokens IS NOT NULL AND
    n_tokens > 0`` for its token column.  Without it the filter references
    the computed count, and Catalyst pushes that predicate below any
    upstream exchange — re-running the tokenizer on the pre-exchange side
    (the round-6 plan trap documented below for the whitespace path).
    """
    n_tok = F.col(tokens_col) if tokens_col else token_count(F.col(text_col))
    if tokens_col:
        if cheap_filter is not None:
            out = df.filter(cheap_filter).withColumn("n_tokens", n_tok)
        else:
            out = df.withColumn("n_tokens", n_tok).filter(
                F.col("n_tokens").isNotNull() & (F.col("n_tokens") > 0)
            )
    else:
        # n_tokens > 0 ⟺ the text has a char outside the whitespace class
        # (token_count is null only for null text).  Filtering on the cheap
        # rlike instead of the computed count matters physically: a filter
        # on the count expression is pushed below any upstream exchange and
        # re-evaluates the full trim+split there (round-6 plan audit:
        # sequence_packing ran the tokenizer 3x, twice of those on the
        # unparallelized scan side), while the rlike pushes to the scan as
        # a cheap predicate and the tokenizer runs ONCE, post-exchange.
        out = df.filter(F.col(text_col).rlike("[^ \t\n\r\f\x0B]")).withColumn(
            "n_tokens", n_tok
        )
    out = out.withColumn("shard", sample_bucket(F.col(key)) % F.lit(n_shards))
    w = (
        Window.partitionBy(*group_cols, "shard")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return out.withColumn("pack_id", F.floor(start / F.lit(budget)))


def pack_stats(packed: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-pack rollup: documents and token totals (the audit table)."""
    return packed.groupBy(*group_cols, "shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def shuffle_shards(
    df: DataFrame,
    key: str,
    n_shards: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Deterministic GLOBAL pseudo-random shuffle into training shards:
    adds ``shard`` and ``shard_pos`` such that reading shards in order
    visits documents in md5(seed:key) order — i.i.d.-looking, with
    source/host/time locality broken (upstream the corpus is grouped by
    exactly those).  Training loaders read ``shard = pmod(i)`` files
    sequentially; re-shuffling between epochs is a new ``seed``.

    Scale shape: shard assignment is a pure column function; the only
    wide op is one hash-partitioned window per shard whose sort is
    bounded to corpus/n_shards rows (size n_shards so a shard's keys fit
    an executor's spillable sort, e.g. ~10M rows/shard at 10^12 docs →
    n_shards 10^5).  No global sort, no driver state; md5 keeps the
    layout bit-reproducible in any engine (the DuckDB oracle replays
    it), invariant to input partitioning and retries.
    """
    h = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(key).cast("string"))
    )
    out = df.withColumn("__shuf", h).withColumn(
        "shard",
        F.conv(F.substring("__shuf", 1, 8), 16, 10).cast("long")
        % F.lit(n_shards),
    )
    w = Window.partitionBy("shard").orderBy("__shuf", key)
    return out.withColumn(
        "shard_pos", F.row_number().over(w) - F.lit(1)
    ).drop("__shuf")


def materialize_packs(
    packed: DataFrame,
    key: str,
    text_col: str = "text",
    group_cols: tuple[str, ...] = (),
    sep: str = "\n\n",
) -> DataFrame:
    """One row per pack: member documents concatenated in pack order
    (``sep`` stands in for the tokenizer's EOS/document separator) plus
    ``n_docs`` / ``total_tokens`` — the final materialization a training
    loader actually reads, downstream of :func:`pack_documents`.

    Scale shape: one groupBy over (group, shard, pack_id).  Each group
    is bounded by the token budget (a pack is ~budget tokens however big
    the corpus), so the ``collect_list`` is small by construction and
    the shuffle moves each text byte exactly once — there is no cheaper
    way to materialize concatenated packs.  In-pack order is
    ``array_sort`` on the pack key, the same order the packing window
    used, so output is bit-deterministic and partitioning-invariant.
    """
    item = F.struct(F.col(key).alias("k"), F.col(text_col).alias("t"))
    ordered = F.array_sort(F.collect_list(item))
    return packed.groupBy(*group_cols, "shard", "pack_id").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["t"]), sep
        ).alias("pack_text"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    key: str,
    chunk_words: int = 256,
    overlap: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Context-window preparation: split every document into fixed-size
    word windows with overlap — the chunking step before training on long
    documents (or indexing them for retrieval).  Emits one row per chunk:
    ``(key, chunk_id, start_word, n_words, chunk_text)`` where chunk i
    starts at ``i·(chunk_words − overlap)`` and chunk_text is the
    space-joined word slice (whitespace is canonicalized — by this stage
    text has been extracted/scrubbed and packing counts words, not bytes).

    Pure codegen: split → sequence of starts → posexplode → slice +
    array_join; no UDF, no shuffle — a scan-local map stage that scales
    with the input partitioning.  Documents shorter than one chunk yield
    exactly one chunk; NULL/whitespace-only text yields none."""
    if overlap >= chunk_words:
        raise ValueError(f"overlap {overlap} must be < chunk_words {chunk_words}")
    step = chunk_words - overlap
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"[ \t\n\r\f\x0B]+"),
        lambda x: x != "",
    )
    # size(_w) > 0 ⟺ text has a non-whitespace char; the cheap rlike pushes
    # to the scan while a filter on the split array would re-run the
    # tokenizer below any upstream exchange (see pack_documents)
    d = df.filter(F.col(text_col).rlike("[^ \t\n\r\f\x0B]")).select(
        F.col(key), words.alias("_w")
    )
    # last chunk = the largest step multiple that still contributes a word
    # beyond the previous chunk's overlap (every word covered, and no
    # trailing chunk that is a pure sub-window of its predecessor)
    bound = F.greatest(F.size("_w") - overlap - 1, F.lit(0))
    starts = F.sequence(F.lit(0), bound - bound % step, F.lit(step))
    chunks = d.select(
        key, F.size("_w").alias("_n"), F.col("_w"), F.posexplode(starts)
    )
    sl = F.slice(F.col("_w"), F.col("col") + 1, chunk_words)
    return chunks.select(
        key,
        F.col("pos").alias("chunk_id"),
        F.col("col").alias("start_word"),
        F.size(sl).alias("n_words"),
        F.array_join(sl, " ").alias("chunk_text"),
    )
