"""Deduplication operators for a training-data pipeline.

Exact (hash-groupBy), MinHash+LSH (shingle→minhash→band→bucket), SimHash,
n-gram Jaccard and embedding-cosine near-dup — the dedup battery a 100-TB
web-text pipeline runs between filtering and training.  Design rules:

* candidate generation NEVER does an all-pairs join: LSH bands / simhash
  buckets / prefix families reduce to equi-joins on high-cardinality keys,
* everything is deterministic (md5 / polynomial hashes, no salted
  ``hash()``),
* verification (exact Jaccard / Hamming / cosine) runs only on candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def shingle_column(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (Arrow UDF — measured >10× faster than the
    interpreted higher-order-function path, see entry_queries._shingles)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _sh(texts: pd.Series) -> pd.Series:
        def sh(t):
            if t is None:
                return []
            w = t.split()
            if len(w) < k:
                return []
            return list({" ".join(w[i : i + k]) for i in range(len(w) - k + 1)})

        return texts.map(sh)

    return _sh(text)


def exact_dedup(df: DataFrame, key: str, text_col: str = "text") -> DataFrame:
    """Keep the lowest-key representative of each exact-content group.

    Content hash groupBy — at scale a map-side partial agg then one shuffle
    on the 128-bit hash (never on the text bytes)."""
    h = F.md5(F.col(text_col)).alias("_h")
    winners = df.select(F.col(key), h).groupBy("_h").agg(F.min(key).alias(key))
    return df.join(winners, key, "left_semi")


def minhash_signatures(
    df: DataFrame, key: str, text_col: str = "text", n_hashes: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(key, h0..h{n-1}) MinHash signature per doc over 3-word shingles.

    ``hash_fn="xxhash64"`` (default) computes the n seeded hashes JVM-side
    at 4.3× the md5 chain's speed (33.9 s → 7.9 s over the 550k-doc kept
    slice of the 1M corpus) — this stage dominated the corpus build under
    md5.  ``"md5"`` remains for the portable form the oracled contract
    query uses (DuckDB has md5, not xxhash64); minhash quality is
    hash-agnostic, only collision structure matters."""
    sh = df.select(key, F.explode(shingle_column(F.col(text_col))).alias("shingle"))
    if hash_fn == "xxhash64":
        hashes = [
            F.min(F.xxhash64(F.lit(b), F.col("shingle"))).alias(f"h{b}")
            for b in range(n_hashes)
        ]
    elif hash_fn == "md5":
        hashes = [
            F.min(F.md5(F.concat(F.lit(str(b)), F.col("shingle")))).alias(f"h{b}")
            for b in range(n_hashes)
        ]
    else:  # a typo must not silently pick the 4.3×-slower chain
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return sh.groupBy(key).agg(*hashes)


def lsh_candidate_pairs(
    sig: DataFrame, key: str, n_hashes: int = 8, band_size: int = 2,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band.

    Bands are concatenations of ``band_size`` minhashes; docs are grouped by
    (band_id, band_value) and pairs enumerated within buckets via self-join
    on the bucket key.  Typical buckets are small (that is the point of
    banding), BUT a boilerplate family — thousands of near-identical junk
    pages sharing their minhashes — makes one bucket quadratic:
    ``max_bucket`` drops (band, bucket) groups larger than the cap before
    the self-join, bounding every bucket at cap·(cap−1)/2 pairs.  Members
    of an oversized bucket still pair through their OTHER bands unless
    they are wholesale near-identical — exactly the family whose canonical
    representative survives exact dedup upstream.  Measured on 220k docs
    with 10% planted dups and NO upstream quality filter: 298 s uncapped →
    bounded with the cap (see BENCH.md); same verified pairs on the
    contract corpus (max bucket there ≪ cap)."""
    n_bands = n_hashes // band_size
    bands = []
    for i in range(n_bands):
        cols = [F.col(f"h{j}") for j in range(i * band_size, (i + 1) * band_size)]
        # xxhash64 over the band's minhashes: type-agnostic (long or string
        # signatures) and far cheaper than the md5(concat) it replaces
        bands.append(F.xxhash64(F.lit(i), *cols).alias(f"b{i}"))
    banded = sig.select(key, *bands)
    stack_expr = ", ".join(f"{i}, b{i}" for i in range(n_bands))
    # materialize the (key, band, bucket) rows ONCE: the hot-bucket
    # aggregate and the self-join otherwise each re-run the full signature
    # lineage (shingle explode + n_hashes min-aggregations) — 2 full sig
    # computations on a 1M-doc corpus build.  Same narrow-row argument as
    # the simhash bucket table below: 3 small columns × n_bands rows/doc.
    buckets = banded.select(
        key, F.expr(f"stack({n_bands}, {stack_expr}) as (band, bucket)")
    ).localCheckpoint(eager=True)
    if max_bucket is not None:
        hot = (
            buckets.groupBy("band", "bucket")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("band", "bucket")
        )
        buckets = buckets.join(hot, ["band", "bucket"], "left_anti")
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .select(F.col(f"a.{key}").alias("a"), F.col(f"b.{key}").alias("b"))
        .distinct()
    )


def signature_prefilter(
    sig: DataFrame,
    pairs: DataFrame,
    key: str,
    n_hashes: int = 8,
    min_est: float = 0.375,
) -> DataFrame:
    """Minhash-agreement prefilter between LSH banding and exact verify.

    est-J(a, b) = (# equal minhashes) / n_hashes is an unbiased Jaccard
    estimate already sitting in the signature table; filtering candidate
    pairs on it is a NARROW join (n_hashes longs per side) that runs before
    the expensive shingle-array verify join.  The corpus-curve profile
    showed candidate volume is the one superlinear term on low-entropy
    corpora (tiny shared vocabularies give random doc pairs J ≈ 0.2–0.3,
    so banding false-positives grow ~quadratically); this cuts the pairs
    the verify stage must carry shingle arrays for.

    RECALL TRADEOFF — deliberately opt-in (``build_corpus`` default off):
    a true pair at exactly J = 0.7 has P(fewer than ⌈min_est·n⌉ of 8
    hashes agree) ≈ 1.1% at the default min_est = 3/8, ≈ 5.8% at 4/8.
    Verification stays exact for every surviving pair, so precision is
    unaffected.  Use where candidate volume, not the last percent of
    borderline recall, is the binding constraint."""
    arr = F.array(*[F.col(f"h{i}") for i in range(n_hashes)])
    s = sig.select(F.col(key), arr.alias("_s"))
    est = (
        F.size(
            F.filter(
                F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda eq: eq
            )
        )
        / n_hashes
    )
    return (
        pairs.join(
            s.withColumnRenamed(key, "a").withColumnRenamed("_s", "_sa"), "a"
        )
        .join(s.withColumnRenamed(key, "b").withColumnRenamed("_s", "_sb"), "b")
        .filter(est >= F.lit(min_est))
        .select("a", "b")
    )


def cap_shingle_df(sh: DataFrame, cap: int, shingle_col: str = "shingle") -> DataFrame:
    """Drop shingles with document frequency > cap from an exploded
    (doc, shingle) table — the standard boilerplate guard before any
    shingle self-join: pair count inside one bucket is quadratic in df, so
    a navbar shingle shared by 10⁵ docs makes a 10¹⁰-pair bucket.  The cap
    bounds every bucket at cap·(cap−1)/2 pairs regardless of corpus size.

    Joined as an ANTI-join against the HOT set (df > cap), not a semi-join
    against the rare set: the hot side is tiny by construction (boilerplate
    only — at most distinct_shingles/cap entries), so AQE turns this into a
    broadcast anti-join and the exploded table is shuffled once (the df
    aggregate) instead of twice."""
    hot = sh.groupBy(shingle_col).agg(F.count("*").alias("_df")).filter(F.col("_df") > cap)
    return sh.join(hot.select(shingle_col), shingle_col, "left_anti")


def jaccard_verify(
    df: DataFrame, candidates: DataFrame, key: str, text_col: str = "text", threshold: float = 0.7
) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only: (a, b, jaccard).

    Shingles are xxhash64-hashed before the pair joins: the shuffled
    payload shrinks from ~2 kB of strings to 8 B longs per shingle and
    array_intersect compares longs — measured 21.3 s → 11.1 s over 524k
    candidate pairs on the 1M-doc corpus.  Jaccard over hashed shingle
    sets equals the string-set value up to 2⁻⁶⁴-probability collisions."""
    sh = df.select(
        F.col(key).alias("_k"),
        F.transform(shingle_column(F.col(text_col)), lambda x: F.xxhash64(x)).alias("_s"),
    )
    j = (
        candidates.join(sh.withColumnRenamed("_k", "a").withColumnRenamed("_s", "_sa"), "a")
        .join(sh.withColumnRenamed("_k", "b").withColumnRenamed("_s", "_sb"), "b")
        .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.size("_sa") + F.size("_sb") - F.col("_inter")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("a", "b", F.round("jaccard", 6).alias("jaccard"))


SIMHASH_BITS = 64


def simhash_column(text: Column) -> Column:
    """64-bit SimHash over word unigrams (Arrow UDF, numpy bit-matrix kernel).

    Word hash: first 8 bytes (big-endian) of md5 — chosen over FNV so the
    exact simhash is reproducible in ANSI SQL
    (``('0x'||substr(md5(w),1,16))::UBIGINT``), which is what lets
    ``dedup_simhash`` carry a DuckDB oracle.  Tokenization is lower +
    split on the explicit ASCII whitespace class ``[ \\t\\n\\r\\f\\x0B]`` so
    Spark/Python/SQL agree char-for-char.

    Kernel: md5 once per UNIQUE word in the batch, bits expanded with one
    numpy broadcast into a (vocab, 64) ±1 matrix, per-doc sign-sum via a
    row-gather — no per-word Python bit loop.  Measured on 20k docs × 60
    words (single core): 27.0 s (old per-word 64-iteration loop) → 3.7 s,
    7.3×.  A fully-flat reduceat/unpackbits variant measured SLOWER here
    (6.7–36 s): it materializes the (n_tokens, 64) matrix, and this box is
    memory-bandwidth-bound — the per-doc gather stays in cache."""

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib
        import re

        split = re.compile(r"[ \t\n\r\f\x0B]+").split
        # a set per doc (dedupe only — the sign-sum is order-independent)
        docs = [
            None if t is None else {w for w in split(t.lower()) if w} for t in texts
        ]
        vocab: dict[str, int] = {}
        for d in docs:
            if d:
                for w in d:
                    if w not in vocab:
                        vocab[w] = len(vocab)
        if vocab:
            digests = b"".join(
                hashlib.md5(w.encode("utf-8")).digest()[:8] for w in vocab
            )
            hs = np.frombuffer(digests, dtype=">u8").astype(np.uint64)
            bit_idx = np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :]
            bits = (
                ((hs[:, None] >> bit_idx) & np.uint64(1)).astype(np.int32) * 2 - 1
            )  # (vocab, 64) of ±1
        pow2 = np.uint64(1) << np.arange(SIMHASH_BITS, dtype=np.uint64)
        out = []
        for d in docs:
            if not d:
                out.append(None)
                continue
            acc = bits[[vocab[w] for w in d]].sum(axis=0)
            v = int(pow2[acc > 0].sum(dtype=np.uint64))
            if v >= 1 << 63:  # two's-complement into a signed long
                v -= 1 << 64
            out.append(v)
        return pd.Series(out, dtype="Int64")

    return _simhash(text)


def simhash_near_dup_pairs(
    df: DataFrame, key: str, text_col: str = "text", max_hamming: int = 3, n_blocks: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup via block permutation: split the 64-bit hash into
    ``n_blocks`` 16-bit blocks; two docs within ``max_hamming`` (< n_blocks)
    must share at least one exact block (pigeonhole), so candidates come
    from equi-joins on (block_id, block_value); Hamming distance verifies.

    ``max_bucket`` is the same hot-bucket guard as lsh_candidate_pairs —
    a boilerplate family shares simhash blocks wholesale and turns one
    (block, value) group quadratic.  It defaults OFF here because capping
    trades pair-exactness for throughput: on the near-dup-dense contract
    corpus a 500-cap drops 38% of qualifying pairs (they only co-bucket
    through hot blocks), and this operator's contract is pair-exact
    (brute-force oracle).  Set it for web-scale corpora where exact dedup
    upstream has already collapsed the wholesale-identical families."""
    if max_hamming >= n_blocks:
        raise ValueError(
            f"pigeonhole requires max_hamming < n_blocks "
            f"(got max_hamming={max_hamming}, n_blocks={n_blocks}): a pair "
            f"differing in every block would be missed"
        )
    sim = df.select(F.col(key).alias("k"), simhash_column(F.col(text_col)).alias("sh")).filter(
        F.col("sh").isNotNull()
    )
    # Collapse identical fingerprints FIRST (round-6 rework, guide §2.3/§8:
    # decide with small rows).  Near-dup-dense corpora carry identical-
    # simhash families (one sf1.0 family: 2,537 docs); the old doc-level
    # block self-join was quadratic in FAMILY size inside every shared
    # bucket and re-ran the Arrow fingerprint UDF on both join sides
    # (85 s at sf1.0).  Here the UDF runs ONCE (the family table is
    # materialized — ~16 B per distinct fingerprint), the block self-join
    # runs over DISTINCT fingerprints only, and doc pairs are expanded
    # from the family member lists at the end — output-linear work.
    fams = (
        sim.groupBy("sh")
        .agg(F.array_sort(F.collect_list("k")).alias("ks"), F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    bits_per = SIMHASH_BITS // n_blocks
    blocks = [
        F.shiftrightunsigned(F.col("sh"), i * bits_per)
        .bitwiseAND(F.lit((1 << bits_per) - 1))
        .alias(f"blk{i}")
        for i in range(n_blocks)
    ]
    blocked = fams.select("sh", "n", *blocks)
    stack_expr = ", ".join(f"{i}, blk{i}" for i in range(n_blocks))
    buckets = blocked.select(
        "sh", "n", F.expr(f"stack({n_blocks}, {stack_expr}) as (block, val)")
    )
    intra_src = fams
    if max_bucket is not None:
        # the cap counts DOCS per (block, val) bucket — identical semantics
        # to the old doc-level guard: a fingerprint family drops out of a
        # hot bucket wholesale, and same-fingerprint pairs survive only if
        # the family still shares at least one non-hot bucket
        hot = (
            buckets.groupBy("block", "val")
            .agg(F.sum("n").alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("block", "val")
        )
        buckets = buckets.join(hot, ["block", "val"], "left_anti")
        intra_src = fams.join(buckets.select("sh").distinct(), "sh", "left_semi")
    # hamming-0 pairs: all (a < b) combinations within each fingerprint
    # family — two explodes with a fan-out exchange between them so one
    # huge family cannot pin the expansion to a single task
    exp1 = (
        intra_src.filter(F.col("n") > 1)
        .select("ks", F.posexplode("ks").alias("_i", "a"))
        .repartition(F.col("a"))
    )
    intra = exp1.select(
        "a", F.explode(F.slice("ks", F.col("_i") + 2, F.size("ks"))).alias("b")
    ).select("a", "b", F.lit(0).alias("hamming"))
    # cross-family candidates: block equi-join over DISTINCT fingerprints.
    # A pair sharing m blocks surfaces m times; instead of a .distinct()
    # shuffle over the candidate stream, keep only the row whose matching
    # block is the pair's FIRST shared block — every earlier block's
    # (in)equality is a pure shift/mask expression on (sha, shb), so the
    # dedup is a filter, not an exchange (guide §2.4).
    a, b = buckets.alias("a"), buckets.alias("b")
    joined = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col("a.sh") < F.col("b.sh")),
    ).select(
        F.col("a.sh").alias("sha"), F.col("b.sh").alias("shb"), F.col("a.block").alias("_blk")
    )

    def _blk_eq(i: int):
        mask = F.lit((1 << bits_per) - 1)
        return (
            F.shiftrightunsigned(F.col("sha"), i * bits_per).bitwiseAND(mask)
            == F.shiftrightunsigned(F.col("shb"), i * bits_per).bitwiseAND(mask)
        )

    first_match = F.when(F.col("_blk") == 0, F.lit(True))
    acc = None
    for i in range(1, n_blocks):
        acc = _blk_eq(i - 1) if acc is None else (acc | _blk_eq(i - 1))
        first_match = first_match.when(F.col("_blk") == i, ~acc)
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    verified = (
        joined.filter(first_match.otherwise(F.lit(False)))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("sha", "shb", "hamming")
    )
    # expand verified fingerprint pairs to doc pairs (output-linear):
    # explode side A, fan out, then explode side B
    ka = fams.select(F.col("sh").alias("sha"), F.col("ks").alias("_ka"))
    kb = fams.select(F.col("sh").alias("shb"), F.col("ks").alias("_kb"))
    inter = (
        verified.join(ka, "sha")
        .join(kb, "shb")
        .select("hamming", "_kb", F.explode("_ka").alias("x"))
        .repartition(F.col("x"))
        .select("hamming", "x", F.explode("_kb").alias("y"))
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
            "hamming",
        )
    )
    return intra.unionAll(inter)


def embedding_near_dup_pairs(
    df: DataFrame,
    key: str,
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_tables: int = 64,
    n_planes: int = 20,
    seed: int = 7,
    round_to: int = 6,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: MULTI-TABLE random-hyperplane LSH
    (AND-OR construction) → exact cosine verify on candidates.

    A single sign-bucket table has recall (1−θ/π)^planes per pair — at
    cos 0.9 with 8 planes that is ~7%, useless.  The AND-OR construction
    fixes it: ``n_tables`` independent tables of ``n_planes`` hyperplanes
    each; a pair is a candidate if it collides in ANY table, so recall is
    1−(1−p^n_planes)^n_tables with p = 1−θ/π.  Defaults (64 tables × 20
    planes, round 6 — was 32 × 12): recall per pair at cos 0.95 is
    1−(1−p²⁰)⁶⁴ ≈ 1−2·10⁻⁶, and the candidate rate for a mildly
    correlated pair (cos ≈ 0.3, p ≈ 0.6) drops from 32·0.6¹² ≈ 0.070 to
    64·0.6²⁰ ≈ 0.0023 — measured 2.36 M → 37 k verify pairs on the
    20k-vector sf1.0 contract table (the verify join was the scale term:
    candidate volume grows quadratically with corpus size).  Tune
    n_planes up as the corpus (or its typical inter-doc cosine) grows —
    each extra plane halves the random-collision rate per table.

    All table buckets are computed in ONE vectorized Arrow UDF pass
    (batch matrix multiply), posexploded to (table, bucket) rows, and
    candidates come from an equi-join on that pair — never all-pairs.

    ``max_bucket`` guards the one remaining skew hazard: a mass-duplicated
    embedding family (SEO template pages, empty-page vectors) lands every
    copy in the SAME bucket of EVERY table, turning the self-join quadratic
    in the family size × n_tables.  When set, (table, bucket) groups larger
    than the cap are anti-joined out before the self-join (the hot set is
    tiny, AQE broadcasts it), exactly like the minhash-LSH cap.  Identical-
    vector families should be collapsed by exact dedup upstream — the cap
    bounds the damage when they are not.  Default None keeps the contract
    query exact.
    """
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim)).astype("float64")
    w_vec = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        # vstack is one page-copy over the Arrow-backed row arrays (the
        # old per-row asarray loop was the batch's Python hot spot), and
        # the bit-pack is a (rows·tables, planes) @ (planes,) matvec
        # instead of materializing a (rows, tables, planes) int64 cube
        mat = np.vstack(vecs.to_numpy())
        signs = (mat @ planes.T > 0).astype(np.int64).reshape(-1, n_planes)
        packed = (signs @ w_vec).reshape(len(mat), n_tables)
        return pd.Series(list(packed))

    with_b = df.select(F.col(key).alias("k"), F.col(vec_col).alias("v")).withColumn(
        "bkts", buckets(F.col("v"))
    )
    # materialize the (key, table, bucket) rows once: the self-join below
    # consumes this subtree on BOTH sides (and the hot-bucket aggregate a
    # third time when capped), and without materialization each side
    # re-runs the Arrow bucket UDF over every vector (guide §1.2 — don't
    # compute things twice).  ~24 B per (doc, table) row.
    tabled = with_b.select("k", F.posexplode("bkts").alias("tbl", "bkt")).localCheckpoint(
        eager=True
    )
    if max_bucket is not None:
        hot = (
            tabled.groupBy("tbl", "bkt")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("tbl", "bkt")
        )
        tabled = tabled.join(F.broadcast(hot), ["tbl", "bkt"], "left_anti")
    a, b = tabled.alias("a"), tabled.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(F.col("a.k").alias("ka"), F.col("b.k").alias("kb"))
        .distinct()
    )
    # verify on candidates only: join the (few) candidate pairs back to the
    # vectors rather than carrying 2 vectors through the distinct.  Taken
    # from the RAW frame, not with_b — the verify sides need no buckets,
    # and deriving them from with_b would drag the Arrow UDF back into
    # both join lineages.
    va = df.select(F.col(key).alias("ka"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(key).alias("kb"), F.col(vec_col).alias("vb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        cand.join(va, "ka")
        .join(vb, "kb")
        .withColumn("cos", dot / (norm("va") * norm("vb")))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("ka").alias("a"), F.col("kb").alias("b"), F.round("cos", round_to).alias("cos")
        )
    )


def drop_duplicate_lines(
    docs: DataFrame,
    key: str,
    text_col: str = "text",
    max_line_df: int = 10,
    sep: str = "\n",
) -> DataFrame:
    """C4-style cross-document LINE dedup: a line occurring in more than
    ``max_line_df`` documents is boilerplate (navbars, cookie banners,
    footers) and is removed from EVERY document, preserving the order of
    the surviving lines.

    Plan: posexplode lines → document frequency per line (two-phase count
    distinct) → anti-join the hot-line set (tiny by the same argument as
    ``cap_shingle_df``; AQE broadcasts it) → rebuild each doc with
    collect_list(struct(pos, line)) + array_sort (sorts on the leading pos
    field) + concat_ws.  One wide shuffle on the line hash, one on the doc
    key — both with map-side partial aggregation.

    Returns docs with ``text_deduped`` and ``n_lines_kept`` columns (docs
    whose every line was boilerplate keep an empty string)."""
    lines = docs.select(
        F.col(key), F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line")
    ).withColumn("_lh", F.xxhash64("line"))
    # df-count and anti-join key on the 8-byte line hash so the wide
    # shuffle never ships line strings (only the rebuild groupBy does,
    # and that one needs them); a 2⁻⁶⁴ hash collision could at worst drop
    # one extra cold line as boilerplate
    hot = (
        lines.groupBy("_lh")
        .agg(F.countDistinct(key).alias("_df"))
        .filter(F.col("_df") > max_line_df)
        .select("_lh")
    )
    kept = lines.join(hot, "_lh", "left_anti")
    rebuilt = kept.groupBy(key).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_deduped"),
        F.count("*").alias("n_lines_kept"),
    )
    return (
        docs.join(rebuilt, key, "left")
        .withColumn("text_deduped", F.coalesce("text_deduped", F.lit("")))
        .withColumn("n_lines_kept", F.coalesce("n_lines_kept", F.lit(0)))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    key: str,
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Benchmark decontamination: count, per document, how many distinct
    ``k``-word shingles it shares with an evaluation set — the standard
    pre-training step that keeps eval data out of the corpus (docs with
    ``n_contaminated > 0`` are dropped or audited).

    The benchmark side is tiny relative to the corpus (eval sets are
    thousands of docs, the corpus is billions), so its DISTINCT shingle set
    broadcasts and the corpus-side explode joins against it map-side — no
    wide shuffle of corpus shingles.  Long shingles (k=8 words ≈ 13-gram
    token windows in the literature) keep false positives near zero."""
    bench = (
        benchmark.select(F.explode(shingle_column(F.col(bench_text_col), k)).alias("shingle"))
        .distinct()
    )
    d = docs.select(F.col(key), F.explode(shingle_column(F.col(text_col), k)).alias("shingle"))
    hits = (
        d.join(F.broadcast(bench), "shingle")
        .groupBy(key)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.select(key)
        .join(hits, key, "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
    )


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    key: str,
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 8,
    frac_threshold: float = 0.7,
) -> DataFrame:
    """Per-document contamination AUDIT — the reporting complement of
    :func:`decontaminate`: instead of only counting shared shingles, report
    what FRACTION of each document's distinct ``k``-word shingles appears
    in the eval set, plus a ``dirty`` verdict at ``frac_threshold`` (the
    PaLM/GPT-3-style "doc is contaminated when ≥X% of its n-grams overlap"
    criterion, applied over distinct shingles).

    One corpus pass: explode distinct shingles once, LEFT-join the
    broadcast eval shingle set with a hit marker, and fold totals and hits
    in a single map-side-combined groupBy — the corpus side never
    shuffles on shingles, only on ``key`` with one row per (task, doc)
    partial.  Shingle-less docs (< k words) report (0, 0, 0.0, false).

    Returns (key, n_shingles, n_contaminated, contamination_frac, dirty);
    the fraction is rounded to 6 (the contract grid)."""
    bench = (
        benchmark.select(
            F.explode(shingle_column(F.col(bench_text_col), k)).alias("shingle")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    d = docs.select(
        F.col(key),
        F.explode_outer(shingle_column(F.col(text_col), k)).alias("shingle"),
    )
    stats = (
        d.join(F.broadcast(bench), "shingle", "left")
        .groupBy(key)
        .agg(
            F.count("shingle").alias("n_shingles"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_contaminated"),
        )
    )
    frac = F.when(
        F.col("n_shingles") > 0,
        F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
    ).otherwise(F.lit(0.0))
    return stats.select(
        key,
        "n_shingles",
        "n_contaminated",
        frac.alias("contamination_frac"),
        (frac >= F.lit(frac_threshold)).alias("dirty"),
    )


def _bloom_positions(shingle: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """``n_hashes`` deterministic bit positions for one shingle: the first 8
    hex chars of md5(salt‖shingle) as an integer, mod ``n_bits`` — the same
    portable md5-prefix hash the minhash/stratified-sampling oracles use
    (DuckDB: ``('0x' || substr(md5(i || s), 1, 8))::UBIGINT % n_bits``)."""
    return [
        F.conv(F.substring(F.md5(F.concat(F.lit(str(i)), shingle)), 1, 8), 16, 10)
        .cast("long") % n_bits
        for i in range(n_hashes)
    ]


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    key: str,
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 8,
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """:func:`decontaminate` with the eval-side broadcast replaced by a
    Bloom filter — the 100-TB form when the evaluation suite itself is big.

    :func:`decontaminate` broadcasts the eval set's DISTINCT shingle
    *strings*; for a large benchmark battery (every eval suite × k-gram
    windows) that broadcast is gigabytes.  Here the eval shingles are
    hashed into an ``n_bits``-bit Bloom filter (``n_hashes`` md5-prefix
    hashes), so what ships to every task is a **fixed-size bit array —
    ``n_bits``/8 bytes (128 KiB at the default) regardless of eval-set
    size** — folded into the plan as an ``array<long>`` literal.  The
    corpus side tests membership with pure codegen shift/AND expressions:
    no join, no UDF, no corpus-side shuffle beyond the per-doc count.

    Guarantees: NO false negatives (every truly shared shingle is
    flagged); false-positive rate ≈ (1 − e^(−n_hashes·n/n_bits))^n_hashes
    for n distinct eval shingles — callers treat ``n_flagged > 0`` as
    "audit", exactly like the exact variant.  The two-pass shape
    (distributed position dedup → ≤ n_bits-row bounded driver collect →
    literal broadcast) keeps driver memory O(n_bits), independent of both
    corpus and eval-set size."""
    n_words = (n_bits + 63) // 64
    bench_pos = (
        benchmark.select(F.explode(shingle_column(F.col(bench_text_col), k)).alias("shingle"))
        .select(F.explode(F.array(*_bloom_positions(F.col("shingle"), n_bits, n_hashes))).alias("p"))
        .distinct()
    )
    words = [0] * n_words
    for row in bench_pos.collect():  # bounded: <= n_bits rows by construction
        p = int(row["p"])
        words[p >> 6] |= 1 << (p & 63)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bits = F.lit(signed)

    sh = docs.select(
        F.col(key), F.explode(shingle_column(F.col(text_col), k)).alias("shingle")
    ).withColumn("_bits", bits)
    flag = None
    for i, pos in enumerate(_bloom_positions(F.col("shingle"), n_bits, n_hashes)):
        sh = sh.withColumn(f"_p{i}", pos)
        # signed >> keeps bit (p & 63) intact for any two's-complement word
        t = F.expr(
            f"(shiftright(element_at(_bits, cast(_p{i} div 64 as int) + 1),"
            f" cast(_p{i} % 64 as int)) & 1) = 1"
        )
        flag = t if flag is None else (flag & t)
    hits = (
        sh.withColumn("_hit", flag.cast("int"))
        .groupBy(key)
        .agg(F.sum("_hit").alias("n_flagged"))
    )
    return (
        docs.select(key)
        .join(hits, key, "left")
        .withColumn("n_flagged", F.coalesce("n_flagged", F.lit(0)))
    )


def fuzzy_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    key: str,
    bench_key: str,
    text_col: str = "text",
    bench_text_col: str = "text",
    k: int = 3,
    n_bands: int = 4,
    threshold: float = 0.5,
    max_band_bucket: int = 5000,
) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: MinHash-LSH candidate
    pairs against the evaluation set, then exact shingle-Jaccard
    verification — catches paraphrased / lightly-edited eval leakage that
    exact k-gram overlap (:func:`decontaminate`) misses (the Llama/GPT-3
    style fuzzy decontamination pass).

    Returns ``(key, bench_id, jaccard)`` for every corpus doc whose
    k-word-shingle Jaccard with some benchmark doc clears ``threshold``
    AND that LSH surfaced as a candidate (``n_bands`` seeded min-hash
    bands, band match ⇒ candidate; recall 1−(1−j)^bands per pair —
    deterministic, so an oracle replays it exactly).

    Scale shape: the corpus side is ONE shingle pass reused for both the
    band signatures (map-side min-agg) and the verification counts; the
    eval set is thousands of docs vs a corpus of billions, so its band
    table and its shingle set both broadcast — the corpus never self-joins
    and its shingles only shuffle once (the per-doc signature agg).

    ``max_band_bucket`` is the hot-bucket guard every candidate generator
    in this repo carries: a band value shared by more corpus docs than the
    cap is boilerplate minhash, and joining it would make the candidate
    list O(corpus) (measured: an uncapped run on a 1M-doc corpus whose
    templates overlap the eval set produced a >1 GiB candidate relation
    that AQE then tried to broadcast).  Genuinely contaminated docs keep
    their other ``n_bands − 1`` chances, the same recall argument as
    ``lsh_candidate_pairs``'s max_bucket."""

    def _sh(df: DataFrame, kcol: str, tcol: str) -> DataFrame:
        return df.select(
            F.col(kcol).alias("_k"),
            F.explode(shingle_column(F.col(tcol), k)).alias("_s"),
        )

    def _sig(sh: DataFrame) -> DataFrame:
        # ONE pass computes the band mins AND the shingle-set size — the
        # shingle UDF is the expensive stage, don't rescan it for sizes
        return sh.groupBy("_k").agg(
            *[
                F.min(F.md5(F.concat(F.lit(str(b)), F.col("_s")))).alias(f"h{b}")
                for b in range(n_bands)
            ],
            F.count("*").alias("_n"),
        )

    def _bands(sig: DataFrame) -> DataFrame:
        stack = "stack({n}, {parts}) as (band, sig)".format(
            n=n_bands, parts=", ".join(f"{b}, h{b}" for b in range(n_bands))
        )
        return sig.select("_k", F.expr(stack))

    csh, bsh = _sh(docs, key, text_col), _sh(benchmark, bench_key, bench_text_col)
    # materialize the corpus signature table (round 6): it feeds the hot-
    # bucket aggregate, the candidate join AND the set-size join — without
    # materialization each consumer re-ran the corpus shingle explode +
    # min-agg (the expensive stage; guide §1.2).  One row per corpus doc:
    # n_bands md5 strings + a count.
    csig, bsig = (
        _sig(csh).localCheckpoint(eager=True),
        _sig(bsh).localCheckpoint(eager=True),
    )
    bb = _bands(bsig).withColumnRenamed("_k", "_bk")
    cb = _bands(csig)
    hot = (
        cb.groupBy("band", "sig")
        .agg(F.count("*").alias("_bsz"))
        .filter(F.col("_bsz") > max_band_bucket)
        .select("band", "sig")
    )
    cands = (
        cb.join(F.broadcast(hot), ["band", "sig"], "left_anti")
        .join(F.broadcast(bb), ["band", "sig"])
        .select("_k", "_bk")
        .distinct()
    )
    # verification restricted to candidate docs — and the shingle explode
    # re-runs over the candidate SUBSET only (semi-join the corpus down
    # first), not the whole corpus: candidates are bounded by eval-family
    # size × bands, orders of magnitude below the corpus.  |∩| via the
    # broadcast eval shingle set keyed (bench doc, shingle); sizes ride
    # along the sig aggs.  The candidate list is the one derived relation
    # whose size the planner cannot bound (boilerplate-heavy corpora
    # inflate it) — pin its join to shuffle-hash so a misestimate can
    # never become a driver-killing broadcast (observed: AQE broadcasting
    # a multi-million-pair list on a template-saturated 50k corpus)
    cand_docs = docs.select(F.col(key).alias("_k"), F.col(text_col).alias("_t")).join(
        cands.select("_k").distinct(), "_k", "left_semi"
    )
    cand_sh = cand_docs.select(
        "_k", F.explode(shingle_column(F.col("_t"), k)).alias("_s")
    ).join(cands.hint("shuffle_hash"), "_k")
    inter = (
        cand_sh.join(
            F.broadcast(bsh.withColumnRenamed("_k", "_bk")), ["_bk", "_s"]
        )
        .groupBy("_k", "_bk")
        .agg(F.count("*").alias("_i"))
    )
    nc = csig.select("_k", F.col("_n").alias("_nc"))
    nb = bsig.select(F.col("_k").alias("_bk"), F.col("_n").alias("_nb"))
    return (
        inter.join(nc, "_k")
        .join(F.broadcast(nb), "_bk")
        .withColumn("jaccard", F.col("_i") / (F.col("_nc") + F.col("_nb") - F.col("_i")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("_k").alias(key),
            F.col("_bk").alias("bench_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def connected_components(
    pairs: DataFrame, a: str = "a", b: str = "b", max_iter: int = 25
) -> DataFrame:
    """Near-dup pairs → duplicate clusters: (node, component) with component
    = min node id in the connected component.

    The missing last step of every dedup family (minhash/simhash/embedding
    pairs must become KEEP-ONE groups before scrubbing a training corpus).
    Each round does min-label propagation (every node takes the min of its
    own and its neighbours' labels) PLUS one pointer-jump (label(v) ←
    label(label(v))), which halves the remaining distance to the component
    minimum — convergence in **O(log diameter)** rounds, so even an
    adversarial million-node chain needs ~20 rounds, while web near-dup
    clusters (star-like, diameter ≤ ~4) finish in 1–2 plus the confirming
    round.  The edge list (LSH survivors) is orders of magnitude smaller
    than the corpus, so each round is two small shuffle-on-node-id joins.
    ``localCheckpoint`` truncates the iterative lineage every round —
    without it the plan doubles per iteration and Catalyst analysis
    dominates after ~10 rounds.

    Raises if max_iter rounds don't converge (with pointer jumping that
    would take a graph of diameter > 2^max_iter)."""
    e = pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    edges = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()
    # initialize label(v) = min(v, min neighbor) — one groupBy that already
    # finishes star-shaped clusters, saving a full propagation round
    labels = (
        edges.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("_mn"))
        .select("node", F.least("node", "_mn").alias("label"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            nbr = (
                edges.join(labels.select(F.col("node").alias("v"), F.col("label").alias("vl")), "v")
                .groupBy("u")
                .agg(F.min("vl").alias("nbr_min"))
            )
            # pointer jump: my label's own label (labels is a function, so
            # this is a left join on label = node; roots map to themselves)
            jump = labels.select(
                F.col("node").alias("_jn"), F.col("label").alias("jl")
            )
            nxt = (
                labels.join(nbr, labels["node"] == nbr["u"], "left")
                .join(jump, labels["label"] == jump["_jn"], "left")
                .select(
                    "node",
                    "label",
                    F.least(
                        F.col("label"),
                        F.coalesce("nbr_min", "label"),
                        F.coalesce("jl", "label"),
                    ).alias("new_label"),
                )
                .localCheckpoint(eager=True)
            )
            changed = nxt.filter(F.col("new_label") < F.col("label")).count()
            labels = nxt.select("node", F.col("new_label").alias("label"))
            if changed == 0:
                return labels.withColumnRenamed("label", "component")
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    finally:
        edges.unpersist()


def substring_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """ExactSubstr deduplication (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): remove every token that lies inside
    a >= k-token span occurring more than once in the corpus.

    The paper builds one suffix array over the concatenated corpus — a
    global sorted structure no distributed engine wants.  The Spark-first
    equivalent keeps the exact semantics at window granularity: a token is
    removed iff SOME k-token window containing it appears >= 2 times
    corpus-wide (all copies are removed, the paper's default).  Plan:

    1. per-doc k-gram hashes, natively (``transform`` over a start-index
       sequence; ``xxhash64`` of the space-joined slice) — whole-stage
       codegen, zero Python, no shuffle,
    2. posexplode to an (id, start, hash) stream — exactly one row per
       corpus token position, 16 bytes each,
    3. count occurrences per hash (map-side combined; the ONE shuffle) and
       keep hashes with count >= 2 — at web scale this "duplicated-window"
       set is orders of magnitude smaller than the stream,
    4. join the small dup set back (AQE broadcasts it), collect duplicated
       starts per doc (second, tiny shuffle),
    5. rebuild each doc scan-locally: token at position p survives iff no
       duplicated start s satisfies s <= p <= s+k-1 (a bounded
       higher-order-function filter over the doc's own arrays).

    Within-engine hash collisions (64-bit) are the only approximation:
    P(any collision) ~ n_positions^2 / 2^65 — at 10^12 positions that is
    material, so a 100-TB deployment widens to the 128-bit md5 pair or
    verifies dup groups by first/last token; at contract scale it is ~1e-9.

    Returns (id, n_tokens, n_removed, text_dedup).
    """
    base, occ = _substr_base_occ(docs, text_col, id_col, k)
    # duplicated starts via ONE window count over the hash partition — the
    # groupBy+semi-join alternative shuffles the identical full stream by
    # _h for the join anyway AND recomputes the O(n·k) gram pass on the
    # second branch (measured 2.33 s → 1.39 s at sf0.1 for this form);
    # skew profile is the same: a mass-duplicated span lands all copies in
    # one reduce partition either way (spillable window buffer here,
    # one-reducer join key there)
    from pyspark.sql import Window

    dup_starts = (
        occ.withColumn("_c", F.count("*").over(Window.partitionBy("_h")))
        .filter(F.col("_c") >= 2)
        .groupBy("_id")
        .agg(F.collect_list("_s").alias("_ds"))
    )
    return _substr_rebuild(base, dup_starts, id_col, k)


def _substr_base_occ(docs: DataFrame, text_col: str, id_col: str, k: int):
    """Shared front half of the ExactSubstr operators: tokenized docs plus
    the (id, start, gram-hash) occurrence stream (one row per position)."""
    if k < 2:
        # k=0 would make every empty slice hash equal (total removal);
        # k=1 is plain token-frequency removal — both are caller mistakes
        raise ValueError(f"substring window k must be >= 2, got {k}")
    # ASCII-ws split + drop-empties == Python str.split() on ASCII text and
    # the oracle's list_filter(regexp_split_to_array(...)) exactly (Java \s
    # is the ASCII class [ \t\n\x0B\f\r]); null text → zero tokens (a null
    # array would make F.size return -1 downstream)
    toks = F.coalesce(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""),
        F.array().cast("array<string>"),
    )
    base = docs.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    n = F.size("_toks")
    starts = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        starts, lambda s: F.xxhash64(F.concat_ws(" ", F.slice("_toks", s, k)))
    )
    occ = base.select("_id", F.posexplode(grams).alias("_i", "_h")).select(
        "_id", (F.col("_i") + 1).alias("_s"), "_h"
    )
    return base, occ


def _substr_rebuild(base: DataFrame, dup_starts: DataFrame, id_col: str, k: int) -> DataFrame:
    """Shared back half: drop every token covered by a duplicated start."""
    joined = base.join(dup_starts, "_id", "left").select(
        "_id",
        "_toks",
        F.coalesce("_ds", F.array().cast("array<int>")).alias("_ds"),
    )
    kept = F.filter(
        "_toks",
        lambda t, i: ~F.exists(
            "_ds", lambda s: (s <= i + 1) & (i + 1 <= s + k - 1)
        ),
    )
    return joined.select(
        F.col("_id").alias(id_col),
        F.size("_toks").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).alias("n_removed"),
        F.concat_ws(" ", kept).alias("text_dedup"),
    )


def incremental_substring_dedup(
    spark,
    docs: DataFrame,
    gram_store: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """ExactSubstr across crawl batches, keep-FIRST semantics: a token of
    the NEW batch is removed iff some k-window containing it was already
    seen in ANY earlier batch (gram-hash present in the store) or repeats
    within this batch.  With an empty store this is exactly
    :func:`substring_dedup`; already-shipped copies in old batches are
    never touched (they were first).

    ``gram_store`` is a parquet dir of DISTINCT gram hashes (8 bytes each)
    of every batch's ORIGINAL text — stored pre-removal, so a span that
    survived batch N still kills its re-crawl in batch N+1.  Per batch the
    store-side work is one presence semi-join on the hash (at catalog
    scale, bucket the store on the hash exactly like
    sources/sigstore.BucketedSigStore's bands table); batch-internal
    repeats use the same window count as the batch operator.  The result
    is eagerly materialized BEFORE the store append (the lazy-plan-reads-
    mutated-input hazard, see incremental_dedup).
    """
    from pathlib import Path

    from pyspark.sql import Window

    base, occ = _substr_base_occ(docs, text_col, id_col, k)
    batch_dup = occ.withColumn(
        "_c", F.count("*").over(Window.partitionBy("_h"))
    ).filter(F.col("_c") >= 2).select("_id", "_s")
    new_grams = occ.select(F.col("_h").alias("h")).distinct()
    if Path(gram_store).exists():
        seen = spark.read.parquet(gram_store)
        store_hit = occ.join(seen, occ["_h"] == seen["h"], "left_semi").select("_id", "_s")
        dup = batch_dup.unionByName(store_hit).distinct()
        # append only genuinely-new hashes: the store stays the distinct
        # gram set ever seen instead of growing with every re-crawl
        new_grams = new_grams.join(seen, "h", "left_anti")
    else:
        dup = batch_dup
    dup_starts = dup.groupBy("_id").agg(F.collect_list("_s").alias("_ds"))
    # BOTH plans that read the store must materialize before the append
    # mutates it (persist is not enough — see incremental_dedup)
    result = _substr_rebuild(base, dup_starts, id_col, k).localCheckpoint(eager=True)
    new_grams = new_grams.localCheckpoint(eager=True)
    new_grams.write.mode("append").parquet(gram_store)
    return result


def component_keep_best(
    comp: DataFrame,
    docs: DataFrame,
    key: str,
    score_col: str,
) -> DataFrame:
    """Quality-priority retention inside duplicate clusters: instead of the
    default keep-min-key canonical, keep the member with the HIGHEST
    ``score_col`` (ties → min key) — the NemoCurator / FineWeb retention
    policy ("when near-dups collide, keep the best/longest copy, not the
    lexicographically first url").

    ``comp`` is ``connected_components`` output (node, component); ``docs``
    carries ``key`` and ``score_col``.  Returns (node, component, score,
    is_retained).  Scale shape: one join on node id + one window
    partitioned by CLUSTER id — both operate on the pair-graph nodes only
    (orders of magnitude smaller than the corpus), and the window
    partition is a single duplicate cluster (web near-dup clusters are
    tiny; a pathological mega-cluster is already capped upstream by the
    LSH hot-bucket caps)."""
    from pyspark.sql import Window

    members = comp.join(
        docs.select(F.col(key).alias("node"), F.col(score_col).alias("score")),
        "node",
    )
    w = Window.partitionBy("component").orderBy(F.desc("score"), F.asc("node"))
    return members.withColumn("is_retained", F.row_number().over(w) == 1)
