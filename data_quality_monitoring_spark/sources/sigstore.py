"""Signature stores for incremental dedup: plain parquet vs bucketed catalog.

``plans.corpus.incremental_dedup`` deduplicates each new crawl batch against
the accepted corpus via three store-side joins, each on a DIFFERENT key:

* exact dedup        — anti-join on ``content_hash``,
* LSH candidates     — equi-join on ``(band, bucket)``,
* Jaccard verify     — joins on the doc key (shingle-set lookup).

``ParquetSigStore`` is the simple layout (one parquet dir, bands derived on
read): every batch re-shuffles the store side of all three joins.
``BucketedSigStore`` is the deployment layout the round-2 builder notes
called for: each join's store side is a table BUCKETED ON ITS JOIN KEY, so
Spark plans the store side with zero Exchange — only the (small) batch side
shuffles — and the per-batch shuffle volume stops growing with the store:

* ``{prefix}_sig``    bucketed by the doc key (shingle sets for verify),
* ``{prefix}_hashes`` bucketed by ``content_hash`` (exact-dup anti-join),
* ``{prefix}_bands``  bucketed by ``bucket`` (LSH candidate join) — also
  skips re-deriving 4 band hashes per stored doc every batch,
* ``{prefix}_census`` per-batch (band, bucket, n) partial counts: the
  hot-bucket cap reads this tiny incremental table instead of re-counting
  the full band stream of the store each batch.

Appends are per-table and non-atomic; ``append`` writes the sig table LAST
so a crash mid-append can only leave orphan bands/hashes/census rows, which
are conservative (they can over-cap a bucket or drop an exact re-crawl of a
doc the corpus already holds — never lose a new doc).  A real deployment
makes the four appends one Iceberg/Delta transaction.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIG_COLS = [f"h{i}" for i in range(8)]


def banded_from_sig(sig: DataFrame, key: str) -> DataFrame:
    """(key, band, bucket) stream: 4 bands of 2 minhashes each."""
    bands = [
        F.xxhash64(F.lit(i), F.col(f"h{2*i}"), F.col(f"h{2*i+1}")).alias(f"b{i}")
        for i in range(4)
    ]
    return (
        sig.filter(F.size("shingles") > 0)
        .select(key, *bands)
        .select(key, F.expr("stack(4, 0, b0, 1, b1, 2, b2, 3, b3) as (band, bucket)"))
    )


class ParquetSigStore:
    """Single parquet dir holding (key, h0..h7, content_hash, shingles)."""

    def __init__(self, path: str):
        self.path = str(path)

    def exists(self, spark: SparkSession) -> bool:
        return Path(self.path).exists()

    def sig(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def hashes(self, spark: SparkSession) -> DataFrame:
        return self.sig(spark).select("content_hash")

    def bands(self, spark: SparkSession, key: str) -> DataFrame:
        return banded_from_sig(self.sig(spark), key)

    def census(self, spark: SparkSession) -> DataFrame | None:
        return None  # caller counts the live band stream

    def append(self, spark: SparkSession, accepted_sig: DataFrame, key: str) -> None:
        accepted_sig.select(key, *SIG_COLS, "content_hash", "shingles").write.mode(
            "append"
        ).parquet(self.path)


class BucketedSigStore:
    """Catalog-managed bucketed layout (see module docstring)."""

    def __init__(self, prefix: str, n_buckets: int = 16):
        self.prefix = prefix
        self.n_buckets = n_buckets
        self.t_sig = f"{prefix}_sig"
        self.t_hashes = f"{prefix}_hashes"
        self.t_bands = f"{prefix}_bands"
        self.t_census = f"{prefix}_census"

    def exists(self, spark: SparkSession) -> bool:
        return spark.catalog.tableExists(self.t_sig)

    def sig(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.t_sig)

    def hashes(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.t_hashes)

    def bands(self, spark: SparkSession, key: str) -> DataFrame:
        return spark.table(self.t_bands).select(key, "band", "bucket")

    def census(self, spark: SparkSession) -> DataFrame:
        """Aggregated (band, bucket, n) over the per-batch partials —
        rows scanned grow with DISTINCT occupied buckets and batch count,
        not with store docs; ``compact_census`` folds partials down."""
        return (
            spark.table(self.t_census)
            .groupBy("band", "bucket")
            .agg(F.sum("n").alias("n"))
        )

    def compact_census(self, spark: SparkSession) -> None:
        compacted = self.census(spark).localCheckpoint(eager=True)
        compacted.write.mode("overwrite").format("parquet").saveAsTable(self.t_census)

    def _write(self, df: DataFrame, table: str, bucket_col: str) -> None:
        (
            df.write.mode("append")
            .format("parquet")
            .bucketBy(self.n_buckets, bucket_col)
            .sortBy(bucket_col)
            .saveAsTable(table)
        )

    def append(self, spark: SparkSession, accepted_sig: DataFrame, key: str) -> None:
        sig = accepted_sig.select(key, *SIG_COLS, "content_hash", "shingles")
        sig = sig.localCheckpoint(eager=True)  # one computation, four writes
        bands = banded_from_sig(sig, key).localCheckpoint(eager=True)
        self._write(bands, self.t_bands, "bucket")
        bands.groupBy("band", "bucket").agg(F.count("*").alias("n")).write.mode(
            "append"
        ).format("parquet").saveAsTable(self.t_census)
        self._write(sig.select("content_hash"), self.t_hashes, "content_hash")
        self._write(sig, self.t_sig, key)  # last: see crash note above
