"""Deterministic stratified sampling — reproducible corpus down-sampling.

Every training-corpus build ends with "keep X% of language L / source S":
doing it with ``rand()`` makes reruns (and resumed runs) disagree, so the
sample gate here is a pure function of the ROW KEY: bucket =
int(md5(key)[:8], 16) % 1000, keep iff bucket < rate·1000.  Properties a
100-TB pipeline needs:

* **idempotent / resumable** — a re-run or a partition retry keeps exactly
  the same rows (no RNG state, no partition-index dependence),
* **nested samples** — rate 0.1 is a subset of rate 0.2 (bucket threshold),
  so growing a corpus keeps every previously selected doc,
* **no shuffle** — the gate is a scan-local Column expression,
* **portable** — md5 is reproducible in any engine (the DuckDB oracle runs
  the identical arithmetic), unlike xxhash64 whose seed differs per system.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKETS = 1000


def sample_bucket(key: Column) -> Column:
    """Deterministic 0..999 bucket from the row key (md5-derived)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % BUCKETS


def sample_bucket_sql(key_expr: str) -> str:
    """The identical bucket in ANSI SQL (DuckDB oracle side)."""
    return f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::UBIGINT % {BUCKETS})::BIGINT"


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its deterministic bucket clears its stratum's rate.

    ``rates`` is a small map (languages/sources); for thousands of strata
    switch the nested CASE to a broadcast-joined rates table — same gate,
    and it avoids deep when-chains (flat constructs keep Catalyst linear,
    see rules.first_hit)."""
    threshold = F.lit(int(default_rate * BUCKETS))
    for value, rate in sorted(rates.items()):
        threshold = F.when(F.col(strata) == value, int(rate * BUCKETS)).otherwise(
            threshold
        )
    return df.filter(sample_bucket(F.col(key)) < threshold)


def mixture_sample(
    docs: DataFrame,
    weights: DataFrame,
    token_budget: float,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Source-weighted token-budget corpus assembly (the "data mixture"
    step: DoReMi/Pile-style static mixing).

    Each source gets ``token_budget · weight/Σweights`` tokens; documents
    are admitted in deterministic md5(key) order until their source's quota
    is reached (greedy prefix: a doc is kept iff the tokens *before* it are
    under quota, so quotas may overshoot by at most one document —
    the standard behaviour, and the one an independent engine can replay
    exactly).  Adds ``cum_tokens`` and the ``mix_keep`` flag.

    ``weights`` is a tiny (source, weight) DataFrame → broadcast; the only
    wide operation is the per-source running sum.  At 10^12 docs a global
    per-source sort is the wrong plan — the scale path is the two-pass
    variant of ``stratified_sample``: estimate tokens/bucket per source
    from a 0.1% md5-bucket sample, admit whole buckets below the estimated
    cutoff, and run this exact operator only on the single boundary bucket
    per source (~1/1000 of the data).  Same semantics, no global sort.
    """
    total = weights.agg(F.sum("weight").alias("_tw"))
    quotas = (
        weights.crossJoin(F.broadcast(total))
        .select(
            source_col,
            (F.lit(float(token_budget)) * F.col("weight") / F.col("_tw")).alias(
                "_quota"
            ),
        )
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.join(F.broadcast(quotas), source_col, "left")
        .withColumn("cum_tokens", F.sum(token_col).over(w))
        .withColumn(
            "mix_keep",
            (F.col("cum_tokens") - F.col(token_col))
            < F.coalesce(F.col("_quota"), F.lit(0.0)),
        )
        .drop("_quota")
    )
